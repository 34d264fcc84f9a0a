"""Nested / semi-structured transforms — the reference's request/response
restructuring family re-expressed as JVM array/map expressions
(``F.transform`` / ``F.filter`` / ``map_from_entries`` — never Python).

Reference anchors:
* header normalization (``[name,[values]] → lowercased map, first value``):
  af/fastpath/fastpath/normalize.py:208-216, lowercasing core.py:356
* DNS answer parsing (regex per answer): normalize.py:311-387
* request reordering / response_length: normalize.py:207-308
* endpoint tallies inside nested arrays: core.py:562-578
* max over nested array (transaction ids): db.py:329-333
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalize_headers(pairs: Column) -> Column:
    """``array<struct<name,values array<string>>>`` → map(lower(name) →
    first value). P11 semantics."""
    entries = F.transform(
        pairs, lambda p: F.struct(F.lower(p["name"]).alias("key"), F.element_at(p["values"], 1).alias("value"))
    )
    return F.map_from_entries(entries)


def envelope_unwrap(content: Column, fmt: Column, schema) -> Column:
    """P2: if the record is a `{content, format}` envelope, parse the json
    branch; other formats surface as NULL struct for a later stage."""
    struct_ddl = schema if str(schema).lstrip().lower().startswith("struct<") else f"struct<{schema}>"
    return F.when(F.lower(fmt) == "json", F.from_json(content, schema)).otherwise(
        F.lit(None).cast(struct_ddl)
    )


def parse_dns_answers(answers: Column) -> Column:
    """P16: per-answer regex extraction of (ttl, type, address) from a raw
    answer string, applied inside the array — one `transform`, no explode."""
    return F.transform(
        answers,
        lambda a: F.struct(
            F.regexp_extract(a, r"ttl\s+(\d+)", 1).cast("int").alias("ttl"),
            F.regexp_extract(a, r"type\s+([A-Z]+)", 1).alias("rtype"),
            F.regexp_extract(a, r"((?:\d{1,3}\.){3}\d{1,3})", 1).alias("address"),
        ),
    )


def endpoint_tally(arr: Column, success) -> Column:
    """A5: count successes inside a nested array without exploding."""
    return F.size(F.filter(arr, success))


def nested_max(arr: Column, field: str) -> Column:
    """A6: max over a struct field of a nested array (db.py:329-333)."""
    return F.array_max(F.transform(arr, lambda x: x[field]))


def response_length(resp: Column) -> Column:
    """P15: response_length = Content-Length header when present and
    numeric, else actual body length (normalize.py:274-288 semantics).
    ``resp`` is struct<headers map<string,string>, body string>."""
    cl = F.element_at(resp["headers"], F.lit("content-length")).try_cast("long")
    return F.coalesce(cl, F.length(resp["body"]).cast("long"))


def reorder_requests(reqs: Column, is_primary) -> Column:
    """P15: stable reorder — primary requests first, others after, original
    relative order preserved (array concat of two filters, no sort)."""
    return F.concat(F.filter(reqs, is_primary), F.filter(reqs, lambda r: ~is_primary(r)))
