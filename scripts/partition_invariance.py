"""Partition-invariance probe: a query whose rounded floats depend on
partial-aggregation order would flake under driver re-runs. Run each
float-heavy query under shuffle.partitions=7 and =32 and require
bit-identical canonical output."""
import sys, os
sys.path.insert(0, '/root/repo')
QUERIES = [
    "events_user_entropy", "corpus_zipf_slope", "corpus_oov_rate",
    "agg_higher_moments", "events_seasonal_baseline", "events_ks_two_sample",
    "events_mann_whitney_u", "agg_jackknife_se", "agg_binned_quantiles",
    "embedding_centroid_drift", "customer_revenue_gini", "events_autocorr_lags",
    "events_xcorr_click_purchase", "brand_discount_elasticity",
    "events_user_burstiness", "nation_supplier_hhi", "dq_chi2_independence",
    "events_ewma_zscore", "customer_rfm_segments",
]
SF = '/root/testdata/sf0.01'
from pyspark.sql import SparkSession

def run_with(n_parts):
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", str(n_parts))
             .appName(f"pinv{n_parts}").getOrCreate())
    from gcs2postgres_spark.queries import REGISTRY
    out = {}
    for name in QUERIES:
        rows = REGISTRY[name].fn(spark, SF).collect()
        canon = sorted(tuple(sorted(r.asDict().items())) for r in rows)
        out[name] = canon
    spark.stop()
    return out

a = run_with(7)
b = run_with(32)
bad = [n for n in QUERIES if a[n] != b[n]]
print("MISMATCH:", bad if bad else "none — all partition-invariant")
