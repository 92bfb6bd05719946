"""Race impute-median formulations (r8: verdict task 5 — close the last 4%
at 100×, 2.04× vs DuckDB with the r7 three-pass plan).

Formulation 7 ("fused2"): fold the per-sensor base aggregates (n, n_null,
Σ half-cents) INTO the median window pass — both key on sensor_id, so one
shuffle+sort of the full (sensor, value, hc) projection serves both. Null
rows ride the same shuffle sorted NULLS FIRST; non-null rank = rn − n_null,
and all-null sensors keep one representative row (rn == 1) so the fallback
join still sees them. 3 source scans → 2 (window pass + global median).

Usage: python tools/race_impute.py [--sf /tmp/sf10] [--runs 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fused2(spark, sf_dir) -> DataFrame:
    from satsure_agri_datapipeline_spark.operators.joins import report_sort
    from satsure_agri_datapipeline_spark.plans.catalog import (
        events_as_readings,
        half_cents,
        half_up,
    )

    r = events_as_readings(spark, sf_dir)
    col = "battery_level"
    allr = r.select(
        "sensor_id",
        F.col(col).alias("__v"),
        half_cents(F.col(col)).alias("__hc"),
    )
    w_n = Window.partitionBy("sensor_id")
    w_rn = Window.partitionBy("sensor_id").orderBy(F.asc_nulls_first("__v"))
    annotated = allr.select(
        "sensor_id",
        "__v",
        F.count(F.lit(1)).over(w_n).alias("__n"),
        F.sum(F.col("__v").isNull().cast("long")).over(w_n).alias("__n_null"),
        F.sum("__hc").over(w_n).alias("__s"),
        F.row_number().over(w_rn).alias("__rn"),
    )
    m = F.col("__n") - F.col("__n_null")  # non-null count
    nn_rank = F.col("__rn") - F.col("__n_null")
    kept = annotated.where(
        (
            F.col("__v").isNotNull()
            & (
                (nn_rank * 2 == m)
                | (nn_rank * 2 == m + 1)
                | (nn_rank * 2 == m + 2)
            )
        )
        | ((m == 0) & (F.col("__rn") == 1))
    )
    per_sensor = kept.groupBy("sensor_id").agg(
        (F.min("__v") + (F.max("__v") - F.min("__v")) * F.lit(0.5)).alias("__med"),
        F.first("__n").alias("__n"),
        F.first("__n_null").alias("__n_null"),
        F.first("__s").alias("__s"),
    )
    gmed = r.agg(F.median(col).alias("__g"))
    return (
        per_sensor.crossJoin(F.broadcast(gmed))
        .select(
            "sensor_id",
            half_up(
                (
                    F.coalesce(F.col("__s"), F.lit(0))
                    + F.col("__n_null")
                    * half_cents(F.coalesce(F.col("__med"), F.col("__g")))
                )
                * 50.0
                / F.col("__n")
            ).alias("avg_imputed_battery_e4"),
        )
        .transform(report_sort, "sensor_id")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--check-sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="race_impute", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    current = entry_mod.queries()["sensor_impute_median"]

    # correctness first: cell-identical to the current oracle-pinned form
    want = [tuple(r) for r in current(spark, args.check_sf).collect()]
    got = [tuple(r) for r in fused2(spark, args.check_sf).collect()]
    assert got == want, f"fused2 mismatch at {args.check_sf}"
    print(f"# fused2 == current on {len(want)} rows at {args.check_sf}")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(current(spark, args.sf))  # warm scan/codegen
    out = {}
    for name, fn in (("current", current), ("fused2", fused2)):
        df = fn(spark, args.sf)
        per = []
        for _ in range(args.runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 3))
        out[name] = min(per)
        print(f"# {name}: best {min(per)} of {per}")
    print(out)


if __name__ == "__main__":
    main()
