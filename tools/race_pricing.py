"""Formulation race for tpch_pricing_summary (VERDICT r6 task 1: 5.29x vs
DuckDB at 1000x, the worst surviving headline ratio, never had a dedicated
investigation).

Hypothesis ranking:
- H1 cents() = round(col*100, 0): Spark's Round codegen on DoubleType
  allocates a java.math.BigDecimal PER VALUE (Spark math expressions,
  RoundBase.doGenCode) — 4 round calls/row x 600M rows = 2.4B allocations.
  floor(col*100 + 0.5) is pure double arithmetic + one cast, identical for
  the non-negative 2-decimal inputs (catalog.half_up precedent).
- H2 columnarReaderBatchSize (4096 default) — larger batches amortize the
  per-batch virtual calls in the vectorized parquet reader.
- H3 off-heap column vectors.
- H4 decimal accumulators instead of long (expected slower; measured for the
  record).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python tools/race_pricing.py [n_runs]
Prints per-variant best-of-N seconds, one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.session import get_spark
from satsure_agri_datapipeline_spark.sources.tables import load_table


def cents_round(col):
    return F.round(col * 100, 0).cast("long")


def cents_floor(col):
    return F.floor(col * 100 + F.lit(0.5))


def pricing_plan(li, cents):
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.col("l_discount"))
    tax_c = cents(F.col("l_tax"))
    n = F.count(F.lit(1))

    def half_up(expr):
        return F.floor(expr + F.lit(0.5)).cast("long")

    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qty_c"),
            price_c.alias("price_c"),
            disc_c.alias("disc_c"),
            tax_c.alias("tax_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").alias("sum_qty_c"),
            F.sum("price_c").alias("sum_base_price_c"),
            F.sum(F.col("price_c") * (100 - F.col("disc_c"))).alias("sum_disc_price_e4"),
            F.sum(
                F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c"))
            ).alias("sum_charge_e6"),
            half_up(F.sum("qty_c") * 100.0 / n).alias("avg_qty_e4"),
            half_up(F.sum("price_c") * 100.0 / n).alias("avg_price_e4"),
            half_up(F.sum("disc_c") * 100.0 / n).alias("avg_disc_e4"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_plan_decimal(li):
    """H4: accumulate in DECIMAL(20,0) instead of long."""
    dec = "decimal(20,0)"
    qty_c = cents_floor(F.col("l_quantity")).cast(dec)
    price_c = cents_floor(F.col("l_extendedprice")).cast(dec)
    disc_c = cents_floor(F.col("l_discount")).cast(dec)
    tax_c = cents_floor(F.col("l_tax")).cast(dec)
    n = F.count(F.lit(1))

    def half_up(expr):
        return F.floor(expr + F.lit(0.5)).cast("long")

    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qty_c"),
            price_c.alias("price_c"),
            disc_c.alias("disc_c"),
            tax_c.alias("tax_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").cast("long").alias("sum_qty_c"),
            F.sum("price_c").cast("long").alias("sum_base_price_c"),
            F.sum(F.col("price_c") * (100 - F.col("disc_c"))).cast("long").alias("sum_disc_price_e4"),
            F.sum(
                F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c"))
            ).cast("long").alias("sum_charge_e6"),
            half_up(F.sum("qty_c") * 100.0 / n).alias("avg_qty_e4"),
            half_up(F.sum("price_c") * 100.0 / n).alias("avg_price_e4"),
            half_up(F.sum("disc_c") * 100.0 / n).alias("avg_disc_e4"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="race_pricing", timezone="UTC")
    li = load_table(spark, sf_dir, "lineitem")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def conf_ctx(kv):
        saved = {k: spark.conf.get(k) for k in kv}
        for k, v in kv.items():
            spark.conf.set(k, v)
        return saved

    # warmup / sanity: both cents forms must agree cell-for-cell
    a = pricing_plan(li, cents_round).collect()
    b = pricing_plan(li, cents_floor).collect()
    d = pricing_plan_decimal(li).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "floor form diverged!"
    assert [tuple(r) for r in a] == [tuple(r) for r in d], "decimal form diverged!"
    print("# sanity: round == floor == decimal on", len(a), "groups", file=sys.stderr)

    variants = {
        "A_round_current": (lambda: pricing_plan(li, cents_round), {}),
        "B_floor": (lambda: pricing_plan(li, cents_floor), {}),
        "C_floor_batch16k": (
            lambda: pricing_plan(li, cents_floor),
            {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
        ),
        "D_floor_offheap_vec": (
            lambda: pricing_plan(li, cents_floor),
            {"spark.sql.columnVector.offheap.enabled": "true"},
        ),
        "E_decimal_acc": (lambda: pricing_plan_decimal(li), {}),
    }
    results = {}
    for name, (mk, conf) in variants.items():
        saved = conf_ctx(conf) if conf else {}
        df = mk()
        per = []
        for _ in range(n_runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 2))
        if saved:
            conf_ctx(saved)
        results[name] = min(per)
        print(f"# {name}: best {min(per)}s of {per}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, "results": results}))


if __name__ == "__main__":
    main()
