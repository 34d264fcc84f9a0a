"""``python -m pipeline_spark`` — see :mod:`pipeline_spark.cli`."""

from pipeline_spark.cli import main

main()
