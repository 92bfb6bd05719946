"""r9 race: impute-median formulation 8 candidates vs the committed
formulation 7 (window-sort fold, plans/catalog.py sensor_impute_median).

The r8 floor analysis said the residual is (a) the exact-median
shuffle+WindowExec pass (WindowExec is row-at-a-time, never codegen'd)
and (b) the separate global-median scan. Candidates:

  v8a: hash-repartition (sensor) -> mapInPandas: per-sensor n/n_null/
       sum_hc/median via pandas groupby + numpy (no Spark-side sort, no
       WindowExec); global median stays F.median (second scan).
  v8b: v8a + the global median FUSED into the same map pass: each
       partition also emits its (value, count) histogram; global median
       = closed-form rank selection over the tiny histogram relation
       (single scan total).

Equality gate: both candidates must produce EXACTLY formulation 7's rows
at sf0.01 AND /tmp/sf10 before timing counts.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from satsure_agri_datapipeline_spark.plans.catalog import (  # noqa: E402
    QUERIES,
    events_as_readings,
    half_cents,
    half_up,
)
from satsure_agri_datapipeline_spark.session import get_spark  # noqa: E402

OUT_SCHEMA = (
    "kind int, sensor_id string, __med double, __n long, __n_null long, "
    "__s long, __v double, __c long"
)


def _sensor_stats(pdf: pd.DataFrame, with_hist: bool):
    """Fully vectorized per-sensor (median, n, n_null, sum_hc): one lexsort
    per partition, group boundaries by adjacency, medians by index
    arithmetic — zero Python-per-group work."""
    import numpy as np

    sid = pdf["sensor_id"].to_numpy()
    v = pdf["__v"].to_numpy(dtype="float64")
    hc = pdf["__hc"].to_numpy(dtype="float64")
    order = np.lexsort((v, sid))  # NaN sorts last within each sensor
    sid_s, v_s = sid[order], v[order]
    isnan = np.isnan(v_s)
    hc_i = np.where(isnan, 0, np.nan_to_num(hc[order])).astype("int64")

    change = np.flatnonzero(sid_s[1:] != sid_s[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(sid_s)]))
    n = ends - starts
    cum_nan = np.concatenate(([0], np.cumsum(isnan)))
    n_null = cum_nan[ends] - cum_nan[starts]
    m = n - n_null
    cum_hc = np.concatenate(([0], np.cumsum(hc_i)))
    s = cum_hc[ends] - cum_hc[starts]

    safe_m = np.maximum(m, 1)
    lo = v_s[starts + (safe_m - 1) // 2]
    hi = v_s[starts + safe_m // 2]
    med = lo + (hi - lo) * 0.5
    out = pd.DataFrame(
        {
            "kind": 0,
            "sensor_id": sid_s[starts],
            "__med": pd.array(np.where(m > 0, med, np.nan), dtype="Float64"),
            "__n": n.astype("int64"),
            "__n_null": n_null.astype("int64"),
            "__s": s.astype("int64"),
            "__v": pd.array([None] * len(n), dtype="Float64"),
            "__c": pd.array([None] * len(n), dtype="Int64"),
        }
    )
    out.loc[m == 0, "__med"] = pd.NA
    if with_hist:
        nnv = pdf["__v"].dropna().to_numpy(dtype="float64")
        vals, counts = np.unique(nnv, return_counts=True)
        hist = pd.DataFrame(
            {
                "kind": 1,
                "sensor_id": None,
                "__med": None,
                "__n": None,
                "__n_null": None,
                "__s": None,
                "__v": vals,
                "__c": counts.astype("int64"),
            }
        )
        out = pd.concat([out, hist], ignore_index=True)
    return out


def _mapped(spark, sf_dir, with_hist: bool):
    r = events_as_readings(spark, sf_dir)
    allr = r.select(
        "sensor_id",
        F.col("battery_level").alias("__v"),
        half_cents(F.col("battery_level")).alias("__hc"),
    )
    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src = allr.repartition(n_parts, "sensor_id")

    def compute(batches):
        chunks = list(batches)
        if not chunks:
            return
        yield _sensor_stats(pd.concat(chunks, ignore_index=True), with_hist)

    return src.mapInPandas(compute, OUT_SCHEMA)


def _finish(per_sensor, gmed):
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
        .orderBy("sensor_id")
    )


def v8a(spark, sf_dir):
    mapped = _mapped(spark, sf_dir, with_hist=False)
    per_sensor = mapped.where(F.col("kind") == 0).select(
        "sensor_id", "__med", "__n", "__n_null", "__s"
    )
    gmed = events_as_readings(spark, sf_dir).agg(
        F.median("battery_level").alias("__g")
    )
    return _finish(per_sensor, gmed)


def v8b(spark, sf_dir):
    from pyspark import StorageLevel

    mapped = _mapped(spark, sf_dir, with_hist=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    per_sensor = mapped.where(F.col("kind") == 0).select(
        "sensor_id", "__med", "__n", "__n_null", "__s"
    )
    hist = (
        mapped.where(F.col("kind") == 1)
        .groupBy("__v")
        .agg(F.sum("__c").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ranked = hist.select(
        "__v",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(tot).alias("__tot"),
    )
    k1 = (F.col("__tot") + 1) / 2
    k2 = (F.col("__tot") + 2) / 2
    gmed = ranked.agg(
        (
            F.min(F.when(F.col("__cum") >= F.floor(k1), F.col("__v")))
            + (
                F.min(F.when(F.col("__cum") >= F.floor(k2), F.col("__v")))
                - F.min(F.when(F.col("__cum") >= F.floor(k1), F.col("__v")))
            )
            * F.lit(0.5)
        ).alias("__g")
    )
    return _finish(per_sensor, gmed), mapped


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="race_impute8", data_dir=sf_dir)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(QUERIES["sensor_global_stats"](spark, sf_dir))

    # equality gate first
    base = QUERIES["sensor_impute_median"](spark, sf_dir)
    want = [tuple(x) for x in base.orderBy("sensor_id").collect()]
    got_a = [tuple(x) for x in v8a(spark, sf_dir).collect()]
    df_b, dep_b = v8b(spark, sf_dir)
    got_b = [tuple(x) for x in df_b.collect()]
    dep_b.unpersist()
    print(f"# equality: v8a={'OK' if got_a == want else 'MISMATCH'} "
          f"v8b={'OK' if got_b == want else 'MISMATCH'} rows={len(want)}",
          file=sys.stderr)
    if got_a != want or got_b != want:
        da = [(w, g) for w, g in zip(want, got_a) if w != g][:3]
        db = [(w, g) for w, g in zip(want, got_b) if w != g][:3]
        print(f"# v8a diffs: {da}\n# v8b diffs: {db}", file=sys.stderr)
        sys.exit(1)

    results = {}
    for name, mk in (
        ("v7_committed", lambda: (base, None)),
        ("v8a_map_fmedian", lambda: (v8a(spark, sf_dir), None)),
        ("v8b_map_hist", lambda: v8b(spark, sf_dir)),
    ):
        per = []
        for _ in range(runs):
            df, dep = mk()
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 2))
            if dep is not None:
                dep.unpersist(blocking=True)
        results[name] = min(per)
        print(f"# {name}: best {min(per)} of {per}", file=sys.stderr)
    print(results)


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "--debug-sensor"):
    main()


def debug_sensor(sf_dir: str, sensor: str):
    spark = get_spark(app_name="race_impute8_dbg", data_dir=sf_dir)
    mapped = _mapped(spark, sf_dir, with_hist=False)
    print("V8ROW:", mapped.where(F.col("sensor_id") == sensor).collect())
    base = QUERIES["sensor_impute_median"](spark, sf_dir)
    print("V7ROW:", base.where(F.col("sensor_id") == sensor).collect())
    got = v8a(spark, sf_dir).where(F.col("sensor_id") == sensor).collect()
    print("V8OUT:", got)
    spark.stop()


if len(sys.argv) > 1 and sys.argv[1] == "--debug-sensor":
    debug_sensor(sys.argv[2], sys.argv[3])
    sys.exit(0)
