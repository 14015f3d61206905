"""Registered-query scale probe: measured wall-clock growth sf0.1 → ~sf1.

VERDICT r9 #6 / r10 #7: the sublinear-growth evidence
(dedup_scale_probe.py) covers the dedup KERNELS at 2.5× data; this probe
measures the most expensive REGISTERED query bodies end-to-end —
`pipeline_clean_near`, `text_winnowing`, `dedup_containment`,
`graph_pagerank`, and (round 11) `ann_quantized` + `text_naive_bayes` —
at k ∈ {2, 5, 10} × the sf0.1 corpus (k=10 ≈ sf1), and reports the fitted
growth exponent α in t ∝ n^α (α from the k=2 → k=10 endpoints). α ≈ 1 is
the shuffle-shaped claim; α ≈ 2 would mean a pairwise blow-up hiding in
a registered body.

Staging reuses dedup_scale_probe's replication scheme — k-fold documents
with per-replica token tagging (each replica keeps its internal
near-dup/fingerprint structure, zero cross-replica shingle or winnowing
fingerprint collisions; doc_id offset per replica keeps the synthetic
link graph a union of k disjoint copies for pagerank). The embeddings
table is k-folded the same way: vec_id offset per replica plus a tiny
deterministic per-replica component perturbation (epsilon growing with
the component index), so replicas are not exact-cosine duplicates of
each other (exact copies would make quantized-vs-exact top-1 a
tie-breaking lottery) while each replica's internal neighborhood
structure is preserved; ann_quantized's bounded query set (vec_id < 50)
stays on replica 0, so its cost shape is bounded-queries x linear scan
by construction — the probe verifies the measured exponent agrees. Each staged corpus
is written as a full sf-dir layout (other tables copied verbatim) so the
UNMODIFIED registered query fns run against it — this times the shipped
code, not a probe-side re-expression.

Run:  python scripts/query_scale_probe.py [k ...]    (default 2 5 10)
Scratch under spark-warehouse/scale_probe/ (gitignored). The measured
table lives in SCALE.md ("Measured registered-query scaling").
"""

import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pysparkdb.session import get_spark  # noqa: E402

SRC = Path("/root/testdata/sf0.1")
SCRATCH = Path(__file__).resolve().parent.parent / "spark-warehouse" / "scale_probe"
QUERIES = ("dedup_containment", "text_winnowing", "pipeline_clean_near",
           "graph_pagerank", "ann_quantized", "text_naive_bayes",
           # round 12: the banded-LSH certificate (its exact-pair ground
           # truth is k disjoint replicas by the tagging scheme — the
           # probe verifies the measured exponent agrees) and the
           # two-shuffle tok-keyed TF-IDF
           "dedup_minhash_lsh", "text_tfidf")


def stage(spark, k: int) -> str:
    """Write a full sf-dir layout with k-fold token-tagged documents."""
    out = SCRATCH / f"k{k}"
    if (out / "_STAGED_v2").exists():  # v2: embeddings k-folded too
        return str(out)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    for f in SRC.glob("*.parquet"):
        if f.name not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(f, out / f.name)
    e = spark.read.parquet(str(SRC / "embeddings.parquet"))
    eparts = []
    for i in range(k):
        eps = F.lit(float(i) * 1e-4)
        eparts.append(
            e.select(
                (F.col("vec_id") + i * 10**9).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: (x + eps * (j.cast("float") + F.lit(1.0)))
                    .cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    estaged = eparts[0]
    for p_ in eparts[1:]:
        estaged = estaged.unionByName(p_)
    estaged.coalesce(max(k // 2, 1)).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet"))
    d = spark.read.parquet(str(SRC / "documents.parquet"))
    parts = []
    for i in range(k):
        tag = F.lit(f"_r{i}")
        parts.append(
            d.select(
                (F.col("doc_id") + i * 10**9).alias("doc_id"),
                F.array_join(
                    F.transform(F.split("text", " "),
                                lambda t: F.concat(t, tag)),
                    " ",
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    staged = parts[0]
    for p in parts[1:]:
        staged = staged.unionByName(p)
    staged.coalesce(max(k // 2, 1)).write.mode("overwrite").parquet(
        str(out / "documents.parquet"))
    (out / "_STAGED_v2").touch()
    return str(out)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [2, 5, 10]
    spark = get_spark(
        "query-scale-probe", master="local[32]",
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "16g",
                     "spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pysparkdb.queries import load_all

    specs = load_all()
    # one warm-up execution at the smallest k so JVM/codegen/Python-pool
    # startup is not billed to the first timed cell
    warm_dir = stage(spark, ks[0])
    for q in QUERIES:
        specs[q].fn(spark, warm_dir).count()
    spark.catalog.clearCache()

    walls: dict[tuple[str, int], tuple[float, int, int]] = {}
    for k in ks:
        sf_dir = stage(spark, k)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for q in QUERIES:
            t0 = time.perf_counter()
            rows = specs[q].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            walls[(q, k)] = (dt, rows, n_docs)
            print(f"k={k:3d} docs={n_docs:>7,}  {q:22s} "
                  f"out_rows={rows:>9,}  {dt:7.2f}s")
            # clean the per-query persist pins so the next cell is not
            # served by this one's cached frames (the bench-protocol rule)
            spark.catalog.clearCache()

    if len(ks) >= 2:
        import math

        lo, hi = ks[0], ks[-1]
        print(f"\nfitted growth exponent alpha (t ~ n^alpha), "
              f"k={lo} -> k={hi} ({hi / lo:.1f}x data):")
        for q in QUERIES:
            t_lo, _, _ = walls[(q, lo)]
            t_hi, _, _ = walls[(q, hi)]
            alpha = math.log(t_hi / t_lo) / math.log(hi / lo)
            print(f"  {q:22s} t({lo})={t_lo:6.2f}s  t({hi})={t_hi:6.2f}s  "
                  f"alpha={alpha:5.2f}")


if __name__ == "__main__":
    main()
