"""Per-record scoring / enrichment stage — the reference's largest operator
family, re-expressed as Catalyst column expressions.

The reference routes every measurement through a test-name dispatcher
(``af/fastpath/fastpath/core.py:1452-1514``) to one of ~16 scorers
(``core.py:499-1449``), each producing a ``scores`` dict with shared keys
(blocking_general, accuracy, msg). A row-at-a-time port would put the whole
hot path inside Python; here the dispatcher is ONE chained ``CASE WHEN``
column expression and every scorer is a pure ``pyspark.sql.functions``
expression, so the entire stage stays inside whole-stage codegen — no
Python worker is ever launched (plan-gated in tests/test_plans.py).

Scorers included (each cites the behavior it mirrors):

* :func:`set_compare_scorer` — compare an observed string-set against an
  expected set with ``array_except`` BOTH ways (missing vs extra), the
  web_connectivity header comparison (``core.py:660-729``);
* :func:`failure_case_table_scorer` — map a failure string through a case
  table to (blocking, accuracy) scores, the dns/tcp failure tables
  (``core.py:1101-1151``);
* :func:`tally_ratio_scorer` — per-record sub-result tally, score =
  failed/total ratio, the per-target scoring of ``core.py:1233-1284``;
* :func:`flag_count_scorer` / :func:`combined_ratio_scorer` — the
  fb_messenger / telegram-whatsapp multi-part shapes
  (``core.py:499-559,581-657,797-905``);
* :func:`bootstrap_progress_scorer` (vanilla_tor, ``core.py:908-940``),
  :func:`response_check_scorer` (meek, ``core.py:1154-1194``),
  :func:`match_flags_scorer` (legacy http_requests, ``core.py:1287-1332``),
  :func:`status_gate_scorer` (signal incl. version gate,
  ``core.py:1344-1378``), :func:`zip_compare_scorer`
  (http_invalid_request_line, ``core.py:732-763``),
  :func:`bootstrap_failure_scorer` (psiphon, ``core.py:1196-1230``),
  :func:`gate_false_positive` (whatsapp version patch,
  ``core.py:840-848``) — the concrete tail of the dispatch dict.

Adding a scorer = one entry in the dict passed to :func:`score` — the
"where does my business transform go" extension point.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, functions as F

#: shared scores-struct fields (the reference's scores dict keys,
#: core.py:381-392): blocking ∈ [0,1], accuracy ∈ {-1,0,1}, msg free-form.
SCORE_FIELDS = ("blocking", "accuracy", "msg")


def make_scores(blocking: Column, accuracy: Column, msg: Column) -> Column:
    """Assemble the canonical scores struct (all scorers emit this shape,
    so the dispatcher's CASE branches type-unify)."""
    return F.struct(
        blocking.cast("double").alias("blocking"),
        accuracy.cast("double").alias("accuracy"),
        msg.cast("string").alias("msg"),
    )


def default_scores() -> Column:
    """The dispatcher's fall-through (unknown test name → unscored,
    accuracy 0 — reference core.py:1504-1510). Built lazily: column
    literals need an active SparkSession."""
    return make_scores(F.lit(0.0), F.lit(0.0), F.lit("unscored"))


def score(
    df: DataFrame,
    dispatch_col: str,
    scorers: Mapping[str, Callable[[DataFrame], Column]],
    default: Column | None = None,
    out_col: str = "scores",
) -> DataFrame:
    """Dispatch every row to its scorer by ``dispatch_col`` value.

    The analog of the reference's ``score_measurement`` dispatcher
    (core.py:1452-1514) as a single chained CASE expression: Catalyst
    evaluates only the matching branch per row, and the whole stage is
    codegen'd — a 100 TB scan pays zero serde.
    """
    if default is None:
        default = default_scores()
    expr: Column | None = None
    for name, fn in scorers.items():
        cond = F.col(dispatch_col) == F.lit(name)
        branch = fn(df)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    out = expr.otherwise(default) if expr is not None else default
    return df.withColumn(out_col, out)


def score_fields(
    df: DataFrame,
    dispatch_col: str,
    scorers: Mapping[str | tuple, Callable[[DataFrame], Column]],
    fields: tuple = ("blocking", "accuracy"),
    default: Column | None = None,
    prefix: str = "scores_",
) -> DataFrame:
    """Field-pruned dispatcher: like :func:`score`, but emits one flat
    column per requested scores field instead of the whole struct.

    Why it exists (round-5 profiling): a consumer that reads 2 of the 3
    struct fields more than once — e.g. the verdict lattice reading
    blocking and accuracy — blocks Catalyst's projection collapse (the
    struct is multi-referenced), so the UNUSED ``msg`` branches (string
    concats) get evaluated per row and discarded. Building the per-field
    CASE from ``branch[field]`` lets SimplifyExtractValueOps delete the
    other fields' work at optimization time: the dispatch query's
    optimized plan shrank ~5x and execution ~2x.

    Scorer keys may be a single dispatch value or a TUPLE of values
    sharing one branch (e.g. two test names scored identically) —
    compiled to one ``IN`` predicate instead of duplicate branches.
    """
    if default is None:
        default = default_scores()
    exprs: dict[str, Column | None] = {f: None for f in fields}
    for name, fn in scorers.items():
        names = name if isinstance(name, tuple) else (name,)
        cond = F.col(dispatch_col).isin(*names)
        branch = fn(df)
        for f in fields:
            b = branch[f]
            exprs[f] = F.when(cond, b) if exprs[f] is None else exprs[f].when(cond, b)
    out = df
    for f in fields:
        e = exprs[f].otherwise(default[f]) if exprs[f] is not None else default[f]
        out = out.withColumn(prefix + f, e)
    return out


def set_compare_scorer(expected: list[str], got_col: Column) -> Column:
    """Two-way set difference scorer (C3 analog, core.py:660-729):
    missing = expected \\ got, extra = got \\ expected; full match → 0
    blocking, any difference → blocking proportional to the asymmetry."""
    exp = F.array(*[F.lit(x) for x in expected])
    got = F.array_distinct(got_col)
    missing = F.array_except(exp, got)
    extra = F.array_except(got, exp)
    n_missing = F.size(missing).cast("double")
    n_extra = F.size(extra).cast("double")
    blocking = F.least(F.lit(1.0), (n_missing * 0.5 + n_extra * 0.25) / F.lit(float(max(len(expected), 1))))
    msg = F.when(
        (n_missing == 0) & (n_extra == 0), F.lit("match")
    ).otherwise(
        F.concat(F.lit("missing="), n_missing.cast("int").cast("string"), F.lit(" extra="), n_extra.cast("int").cast("string"))
    )
    # a NULL observed set (missing test_keys — the reference's
    # header-manipulation "requests: null" fixture, test_unit.py:248-253)
    # is an unusable measurement, NOT a comparable one: without this
    # guard size(NULL) propagates NULL (ANSI) or -1 (legacy) into the
    # ratio, yielding NULL or negative blocking
    null_in = got_col.isNull()
    return make_scores(
        F.when(null_in, F.lit(0.0)).otherwise(blocking),
        F.when(null_in, F.lit(0.0)).otherwise(F.lit(1.0)),
        F.when(null_in, F.lit("missing")).otherwise(msg),
    )


def failure_case_table_scorer(
    failure_col: Column, case_table: dict[str, tuple[float, float]], default: tuple[float, float] = (0.5, 0.0)
) -> Column:
    """Failure-string case table (C10 analog, core.py:1101-1151): a known
    failure maps to fixed (blocking, accuracy); unknown failures get the
    conservative default and are labelled, mirroring the reference's
    unknown-failure logging (C22, core.py:1136-1140).

    Built as FLAT when-chains (one CASE with k branches), not nested
    otherwise-chains: nesting re-embeds ``failure_col`` — itself often a
    CASE expression — once per level of the ELSE pyramid, which measured
    as a 5x optimized-plan blowup and ~2x execution cost in the dispatch
    query (round-5 profiling of the r2->r4 score_dispatch drift)."""
    blocking: Column | None = None
    accuracy: Column | None = None
    msg: Column | None = None
    for fail, (b, a) in case_table.items():
        cond = failure_col == F.lit(fail)
        blocking = F.when(cond, F.lit(b)) if blocking is None else blocking.when(cond, F.lit(b))
        accuracy = F.when(cond, F.lit(a)) if accuracy is None else accuracy.when(cond, F.lit(a))
        msg = F.when(cond, F.lit(fail)) if msg is None else msg.when(cond, F.lit(fail))
    unknown = F.concat(F.lit("unknown_failure:"), failure_col)
    if blocking is None:
        return make_scores(F.lit(default[0]), F.lit(default[1]), unknown)
    return make_scores(
        blocking.otherwise(F.lit(default[0])),
        accuracy.otherwise(F.lit(default[1])),
        msg.otherwise(unknown),
    )


def tally_ratio_scorer(results_col: Column, is_failed) -> Column:
    """Per-record sub-result tally (C13 analog, core.py:1233-1284):
    ``results_col`` is an array column; blocking = failed/total. Uses
    ``filter``/``size`` higher-order functions — no explode, no shuffle."""
    total = F.size(results_col).cast("double")
    failed = F.size(F.filter(results_col, is_failed)).cast("double")
    blocking = F.when(total > 0, failed / total).otherwise(F.lit(0.0))
    msg = F.concat(F.lit("failed "), failed.cast("int").cast("string"), F.lit("/"), total.cast("int").cast("string"))
    return make_scores(blocking, F.when(total > 0, 1.0).otherwise(-1.0), msg)


def flag_count_scorer(
    consistency_flags: list[Column], anomaly_flags: list[Column], weight: float = 0.5
) -> Column:
    """Flag-count scorer (C1 shape, core.py:499-559): every FALSE
    consistency flag and every TRUE anomaly flag adds ``weight`` to
    blocking, capped at 1; nulls count as failed consistency (the
    reference treats absent keys as inconsistent)."""
    terms: Column = F.lit(0.0)
    for c in consistency_flags:
        terms = terms + F.when(c.isNull() | ~c, F.lit(weight)).otherwise(F.lit(0.0))
    for a in anomaly_flags:
        terms = terms + F.when(a.isNotNull() & a, F.lit(weight)).otherwise(F.lit(0.0))
    blocking = F.least(F.lit(1.0), terms)
    msg = F.concat(F.lit("flags_blocking="), F.round(blocking, 2).cast("string"))
    return make_scores(blocking, F.lit(1.0), msg)


def combined_ratio_scorer(parts: list[tuple[Column, "Callable[[Column], Column]"]]) -> Column:
    """Multi-part ratio scorer (C2/C5 shape, core.py:581-657,797-905):
    each part is (array column, is_failed predicate); blocking = mean of
    the per-part failed/total ratios (empty parts contribute 0); accuracy
    degrades to -1 only when EVERY part is empty."""
    ratios: list[Column] = []
    any_rows: Column = F.lit(False)
    for arr, is_failed in parts:
        total = F.size(arr).cast("double")
        failed = F.size(F.filter(arr, is_failed)).cast("double")
        ratios.append(F.when(total > 0, failed / total).otherwise(F.lit(0.0)))
        any_rows = any_rows | (total > 0)
    blocking = sum(ratios[1:], ratios[0]) / F.lit(float(len(parts)))
    msg = F.concat(F.lit("parts="), F.lit(len(parts)).cast("string"))
    return make_scores(blocking, F.when(any_rows, 1.0).otherwise(-1.0), msg)


def bootstrap_progress_scorer(
    log_col: Column,
    progress_col: Column,
    success_markers: list[str],
    rate: float = 0.004,
) -> Column:
    """Bootstrap-progress scorer (C6, the vanilla_tor formula —
    core.py:908-940): a null log is an unknown client bug (unscored,
    accuracy 0); a log containing any success marker scores 0 blocking;
    otherwise blocking = 1 − clamp(progress, 0, 100) × ``rate`` (an 80%
    bootstrap under throttling → 0.68)."""
    success: Column = F.lit(False)
    for m in success_markers:
        success = success | (F.instr(log_col, m) > 0)
    progress = F.least(F.lit(100.0), F.greatest(F.lit(0.0), progress_col.cast("double")))
    blocking = (
        F.when(log_col.isNull(), F.lit(0.0))
        .when(success, F.lit(0.0))
        .otherwise(F.lit(1.0) - progress * F.lit(rate))
    )
    accuracy = F.when(log_col.isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
    msg = (
        F.when(log_col.isNull(), F.lit("missing log"))
        .when(success, F.lit("bootstrapped"))
        .otherwise(F.concat(F.lit("progress="), progress.cast("int").cast("string")))
    )
    return make_scores(blocking, accuracy, msg)


def response_check_scorer(responses_col: Column, server_prefix: str = "ECAcc ") -> Column:
    """Per-response status+header-prefix check (C11, the meek scorer —
    core.py:1154-1194): no responses → blocked and unscorable; any missing
    response or non-200 code → blocking 1; otherwise each 200 response
    whose Server header does not start with ``server_prefix`` adds 0.5.
    ``responses_col`` is array<struct<code:int, server:string>>; a NULL
    element models the reference's "response is None" probe error, and a
    NULL *array* is treated like an empty one (no responses → blocked,
    accuracy 0) so a missing test_keys section can't yield NULL scores
    that silently drop rows from downstream threshold filters."""
    # size(NULL) is -1 (legacy) or NULL (ANSI); normalize both to the
    # no-responses branch via coalesce + n <= 0
    n = F.coalesce(F.size(responses_col), F.lit(-1))
    any_null = F.exists(responses_col, lambda r: r.isNull())
    any_bad_code = F.exists(
        responses_col, lambda r: r.isNotNull() & (F.coalesce(r["code"], F.lit(0)) != 200)
    )
    n_bad_server = F.size(
        F.filter(
            responses_col,
            lambda r: r.isNotNull()
            & (F.coalesce(r["code"], F.lit(0)) == 200)
            & ~F.startswith(F.coalesce(r["server"], F.lit("")), F.lit(server_prefix)),
        )
    ).cast("double")
    blocking = (
        F.when(n <= 0, F.lit(1.0))
        .when(any_null | any_bad_code, F.lit(1.0))
        .otherwise(F.lit(0.5) * n_bad_server)
    )
    accuracy = F.when(n <= 0, F.lit(0.0)).otherwise(F.lit(1.0))
    msg = (
        F.when(n <= 0, F.lit("no requests"))
        .when(any_null, F.lit("missing response"))
        .when(any_bad_code, F.lit("non-200 response"))
        .otherwise(F.concat(F.lit("bad_server="), n_bad_server.cast("int").cast("string")))
    )
    return make_scores(blocking, accuracy, msg)


def match_flags_scorer(flags: list[Column], failed: Column) -> Column:
    """Control-vs-experiment match-flag scorer (C14, the legacy
    http_requests scorer — core.py:1287-1332): a control/experiment failure
    or any missing match flag makes the measurement unusable (accuracy 0);
    otherwise reachable = all flags true, and not-reachable → blocking 1.
    (The fingerprint-confirmation tail of the reference scorer is the
    C17/C18 fingerprint joins composed downstream.)"""
    any_null: Column = F.lit(False)
    all_true: Column = F.lit(True)
    for c in flags:
        any_null = any_null | c.isNull()
        all_true = all_true & F.coalesce(c, F.lit(False))
    unusable = failed | any_null
    blocking = F.when(unusable, F.lit(0.0)).when(~all_true, F.lit(1.0)).otherwise(F.lit(0.0))
    accuracy = F.when(unusable, F.lit(0.0)).otherwise(F.lit(1.0))
    msg = (
        F.when(unusable, F.lit("incorrect measurement"))
        .when(~all_true, F.lit("mismatch"))
        .otherwise(F.lit("match"))
    )
    return make_scores(blocking, accuracy, msg)


def version_key(v: Column) -> Column:
    """Sortable dotted-version key: each numeric segment zero-padded to 5
    digits ('0.2.2' → '00000.00002.00002'), so plain string comparison
    orders like the reference's parse_version (core.py:1354-1366) for
    segments < 100000. Longer segments pass through unpadded (lpad would
    TRUNCATE them): ordering beyond 5 digits is not guaranteed, but the
    encoding matches :func:`_version_key_literal` (zfill never truncates)
    exactly, so column-vs-literal gate comparisons never silently use
    different widths for the same segment."""
    return F.array_join(
        F.transform(
            F.split(v, r"\."),
            lambda s: F.when(F.length(s) > 5, s).otherwise(F.lpad(s, 5, "0")),
        ),
        ".",
    )


def _version_key_literal(v: str) -> str:
    # zfill pads but never truncates — the column expression above mirrors
    # this exactly (pad to 5, pass through longer segments untouched)
    return ".".join(seg.zfill(5) for seg in v.split("."))


def status_gate_scorer(
    status_col: Column,
    failure_gate: Column,
    version_col: Column | None = None,
    min_version: str | None = None,
    cutoff_gate: Column | None = None,
    blocked_value: str = "blocked",
    ok_value: str = "ok",
) -> Column:
    """Version-gated backend-status scorer (C15, the signal scorer —
    core.py:1344-1378): ``failure_gate`` true → unusable; probes older than
    ``min_version`` measuring after the backend change (``cutoff_gate``)
    are unusable (the reference's ooni/probe#2344 patch); status ``ok`` →
    fine, ``blocked`` → blocking 1, anything else → unusable."""
    unusable = failure_gate
    if version_col is not None and min_version is not None:
        too_old = version_key(version_col) < F.lit(_version_key_literal(min_version))
        gated = too_old & (cutoff_gate if cutoff_gate is not None else F.lit(True))
        unusable = unusable | gated
    blocking = F.when(status_col == F.lit(blocked_value), F.lit(1.0)).otherwise(F.lit(0.0))
    accuracy = (
        F.when(unusable, F.lit(0.0))
        .when(status_col.isin(ok_value, blocked_value), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    msg = (
        F.when(unusable, F.lit("unusable"))
        .when(status_col == F.lit(blocked_value), F.lit(blocked_value))
        .otherwise(F.coalesce(status_col, F.lit("unknown")))
    )
    return make_scores(blocking, accuracy, msg)


def zip_compare_scorer(sent_col: Column, received_col: Column) -> Column:
    """Positional sent-vs-received compare (C4, the http_invalid_request_line
    scorer — core.py:732-763): both lists empty → unusable (accuracy 0);
    any positional mismatch within the zipped prefix (zip truncates to the
    shorter list, so trailing extras are ignored) → blocking 1. A NULL
    list is treated like an empty one (the reference coalesces missing
    keys to []) — size(NULL) is -1/NULL depending on ANSI mode, so sizes
    are normalized and the slice length clamped to ≥0 before use."""
    ns = F.coalesce(F.size(sent_col), F.lit(-1))
    nr = F.coalesce(F.size(received_col), F.lit(-1))
    n = F.greatest(F.least(ns, nr), F.lit(0))
    pairs_differ = F.exists(
        F.zip_with(
            F.slice(sent_col, F.lit(1), n),
            F.slice(received_col, F.lit(1), n),
            lambda s, r: ~s.eqNullSafe(r),
        ),
        lambda x: x,
    )
    empty = (ns <= 0) & (nr <= 0)
    blocking = F.when(~empty & pairs_differ, F.lit(1.0)).otherwise(F.lit(0.0))
    accuracy = F.when(empty, F.lit(0.0)).otherwise(F.lit(1.0))
    msg = (
        F.when(empty, F.lit("empty"))
        .when(pairs_differ, F.lit("tampering"))
        .otherwise(F.lit("match"))
    )
    return make_scores(blocking, accuracy, msg)


def bootstrap_failure_scorer(
    failure_col: Column, bootstrap_time_col: Column, resolver_ok: Column | None = None
) -> Column:
    """Failure/bootstrap scorer (C12, the psiphon scorer —
    core.py:1196-1230): null failure with bootstrap_time 0 is an invalid
    measurement (accuracy 0); null failure with a real bootstrap is a
    success; a failure (bootstrap or runtime) → blocking 1; a missing
    resolver_ip (``resolver_ok`` false) voids accuracy."""
    bt = F.coalesce(bootstrap_time_col.cast("double"), F.lit(0.0))
    broken = failure_col.isNull() & (bt == 0)
    blocking = F.when(failure_col.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    accuracy = F.when(broken, F.lit(0.0)).otherwise(F.lit(1.0))
    if resolver_ok is not None:
        accuracy = F.when(~resolver_ok, F.lit(0.0)).otherwise(accuracy)
    msg = (
        F.when(broken, F.lit("invalid measurement"))
        .when(failure_col.isNotNull(), F.coalesce(failure_col.cast("string"), F.lit("failure")))
        .otherwise(F.lit("success"))
    )
    return make_scores(blocking, accuracy, msg)


def gate_false_positive(scores_col: Column, gate: Column, msg: str = "known_client_bug") -> Column:
    """Known-client-bug override (the C5 whatsapp version patch,
    core.py:840-848): when ``gate`` holds (e.g. an affected software_version
    reporting 'blocked'), the blocking signal is a false positive — collapse
    it to 0 while keeping the scorer's accuracy."""
    return F.when(
        gate, make_scores(F.lit(0.0), scores_col["accuracy"], F.lit(msg))
    ).otherwise(scores_col)


def confirmed_determination(scores_col: Column, fingerprint_hit: Column | None = None, threshold: float = 0.5) -> Column:
    """Final verdict from the scores struct (C20 analog, core.py:1517-1539):
    confirmed iff a fingerprint matched; anomaly iff blocking crosses the
    threshold with usable accuracy."""
    fp = fingerprint_hit if fingerprint_hit is not None else F.lit(False)
    blocking = scores_col["blocking"]
    usable = scores_col["accuracy"] >= 0
    return (
        F.when(fp, F.lit("confirmed"))
        .when(usable & (blocking >= threshold), F.lit("anomaly"))
        .when(~usable, F.lit("failed"))
        .otherwise(F.lit("ok"))
    )


def scores_to_json(scores_col: Column) -> Column:
    """Serialize the scores struct to a JSON string (P20 analog — the
    reference stores scores as a JSON TEXT column, core.py:386-392)."""
    return F.to_json(scores_col)


def simple_failure_scorer(failure_col: Column) -> Column:
    """Failure-flag scorer (the stun_reachability / torsf shape,
    core.py:1381-1413): a non-empty failure string → blocking 1,
    otherwise reachable; always scored (accuracy 1)."""
    failed = F.coalesce(failure_col, F.lit("")) != ""
    blocking = F.when(failed, F.lit(1.0)).otherwise(F.lit(0.0))
    msg = F.when(failed, failure_col).otherwise(F.lit("ok"))
    return make_scores(blocking, F.lit(1.0), msg)


def tristate_success_scorer(success_col: Column) -> Column:
    """Tri-state success scorer (the openvpn shape, core.py:1438-1449):
    success False → blocking 1; success NULL → unscorable (accuracy 0);
    success True → reachable."""
    blocking = F.when(success_col.eqNullSafe(F.lit(False)), F.lit(1.0)).otherwise(F.lit(0.0))
    accuracy = F.when(success_col.isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
    msg = (
        F.when(success_col.isNull(), F.lit("no result"))
        .when(success_col, F.lit("ok"))
        .otherwise(F.lit("failed"))
    )
    return make_scores(blocking, accuracy, msg)
