"""Quick subset oracle check during development:

    python scripts/check_subset.py q_name x_other ...

Runs the same Spark-vs-DuckDB comparison as selfcheck.py (rows / schema /
value hash at sf0.01) for just the named queries — the tight feedback
loop while building an operator, before the full-registry selfcheck or
the parametrized pytest run."""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from selfcheck import check_one  # noqa: E402
from data_pipeline_cursor_spark.registry import get_queries, get_oracles  # noqa: E402
from data_pipeline_cursor_spark.session import get_spark  # noqa: E402

spark = get_spark("subset-check")
spark.conf.set("spark.sql.shuffle.partitions", "8")
qs, os_ = get_queries(), get_oracles()
fail = 0
for name in sys.argv[1:]:
    if name not in qs:
        print(name, "UNKNOWN (not a registered query)")
        fail += 1
        continue
    r = check_one(spark, name, qs[name], os_.get(name))
    status = (
        "PASS"
        if r["hash_match"]
        else ("rows_only" if r["err"] == "no_oracle" else "FAIL")
    )
    print(name, status, "spark_rows=", r["spark_rows"], "oracle_rows=", r["oracle_rows"])
    if status == "FAIL":
        fail += 1
        print(r["err"])
sys.exit(1 if fail else 0)
