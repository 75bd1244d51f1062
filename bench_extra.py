"""Round-6 optimization profiling harness (guide §1: measure first).

NOT part of the frozen driver contract — bench.py is untouched. This file
isolates each headline kernel (same inputs as bench.py) and times its
internal stages with noop sinks + job descriptions, so optimization work
targets the measured cost, not a guess.

Usage:
    python bench_extra.py ann          # ANN top-k stage breakdown
    python bench_extra.py dedup        # MinHash-LSH stage breakdown
    python bench_extra.py simhash
    python bench_extra.py ingest
    python bench_extra.py pagerank
    python bench_extra.py cc
    python bench_extra.py headline     # every headline kernel, one number each
    python bench_extra.py registry_top # slowest registry queries at sf0.01

$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_t: dict[str, float] = {}


def timed(spark, name, df=None, fn=None):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    if df is not None:
        df.write.format("noop").mode("overwrite").save()
        out = None
    else:
        out = fn()
    _t[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"  {name}: {_t[name]:.3f}s", flush=True)
    return out


def _session():
    from igpm_pem_spark.session import get_spark

    return get_spark(app_name="bench-extra", cores=CPUS, shuffle_partitions=CPUS)


def _entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_x",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    return entry


def _bench_corpus(spark, entry):
    """Same corpus derivation as bench.py's dedup/ann sections."""
    from pyspark.sql import functions as F

    from igpm_pem_spark.sources.repo_files import generate_repo_files

    dense = entry._edges(spark, SF_DIR, entry.G_PARTS_SQL)
    n_edges = dense.count()
    scale = max(int(n_edges / 500), 20)
    rf = generate_repo_files(spark, n_repos=scale, files_per_repo=50).persist()
    corpus = rf.select(
        F.xxhash64("repo", "path").alias("doc_id"), F.col("content").alias("text")
    ).persist()
    n_docs = corpus.count()
    return rf, corpus, n_docs, n_edges


def _bench_emb(spark, n_vec, dim=32):
    from pyspark.sql import functions as F

    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) - 500) / 500.0
            ).cast("float"),
        ).alias("embedding"),
    ).persist()
    emb.count()
    return emb


def prof_ann():
    from pyspark.sql import Window, functions as F

    from igpm_pem_spark.operators.similarity import (
        _capped_signatures, _pair_cos4, _vec_side, hyperplane_buckets,
    )
    from igpm_pem_spark.functions.hashing import ANN_MAX_BUCKET

    spark = _session()
    entry = _entry()
    _, corpus, n_docs, _ = _bench_corpus(spark, entry)
    n_vec = max(n_docs, 1000)
    emb = _bench_emb(spark, n_vec)
    print(f"n_vec={n_vec}")

    signed = hyperplane_buckets(emb, corpus_count=n_vec, dim=32).select(
        "id", "tbl", "sig"
    )
    timed(spark, "ann.signatures_noop", df=signed)
    t0 = time.time()
    kept, sig_cache = _capped_signatures(signed, ANN_MAX_BUCKET)
    _t["ann.cap_stats_fill"] = round(time.time() - t0, 3)
    q = kept.where(F.col("id") % 25 == 0).select(
        F.col("id").alias("query_id"), "tbl", "sig"
    )
    c = kept.select(F.col("id").alias("neighbor_id"), "tbl", "sig")
    pairs_lazy = (
        q.join(c, ["tbl", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    pairs = timed(
        spark, "ann.pairs_checkpoint", fn=lambda: pairs_lazy.localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()
    print(f"  candidate pairs: {n_pairs}")
    sig_cache.unpersist()
    ea = _vec_side(emb, "vec_id", "embedding", "query_id", "a")
    eb = _vec_side(emb, "vec_id", "embedding", "neighbor_id", "b")
    scored = (
        pairs.join(ea, "query_id")
        .join(eb, "neighbor_id")
        .select("query_id", "neighbor_id", _pair_cos4(dim=32).alias("cos4"))
    )
    timed(spark, "ann.score_noop", df=scored)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", "cos4")
    )
    timed(spark, "ann.topk_noop", df=out)
    print(json.dumps(_t))


def prof_dedup():
    from pyspark.sql import Window, functions as F

    from igpm_pem_spark.functions.hashing import NUM_BANDS, P, ROWS_PER_BAND
    from igpm_pem_spark.operators.dedup import minhash_signatures

    spark = _session()
    entry = _entry()
    _, corpus, n_docs, _ = _bench_corpus(spark, entry)
    print(f"n_docs={n_docs}")

    toks = corpus.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    timed(spark, "dedup.tokenize_noop", df=toks)
    from igpm_pem_spark.functions.text import token_id

    h = toks.select("doc_id", token_id("token").alias("tid"))
    timed(spark, "dedup.token_hash_noop", df=h)
    sig = minhash_signatures(corpus)
    timed(spark, "dedup.signatures_noop", df=sig)

    band_cols = []
    for band in range(NUM_BANDS):
        lo = band * ROWS_PER_BAND
        key = F.lit(0).cast("long")
        for r in range(ROWS_PER_BAND):
            key = key * F.lit(P) + F.col(f"mh{lo + r}")
        band_cols.append(F.struct(F.lit(band).alias("band"), key.alias("key")))
    buckets = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b"))
        .select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
        .persist()
    )
    timed(spark, "dedup.buckets_fill", fn=lambda: buckets.count())
    w_bucket = Window.partitionBy("band", "key")
    sized = buckets.withColumn("sz", F.count("*").over(w_bucket)).where(
        F.col("sz") <= 50
    )
    a = sized.select("band", "key", F.col("doc_id").alias("doc_a"))
    b = sized.select("band", "key", F.col("doc_id").alias("doc_b"))
    pairs_lazy = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pairs = timed(
        spark, "dedup.pairs_checkpoint",
        fn=lambda: pairs_lazy.localCheckpoint(eager=True),
    )
    print(f"  pairs: {pairs.count()}")
    buckets.unpersist()
    print(json.dumps(_t))


def prof_simhash():
    from igpm_pem_spark.operators.dedup import simhash, simhash_near_dup

    spark = _session()
    entry = _entry()
    _, corpus, n_docs, _ = _bench_corpus(spark, entry)
    print(f"n_docs={n_docs}")
    timed(spark, "simhash.hash_noop", df=simhash(corpus))
    timed(
        spark, "simhash.near_dup_count",
        fn=lambda: simhash_near_dup(corpus, max_hamming=1).count(),
    )
    print(json.dumps(_t))


def prof_ingest():
    from igpm_pem_spark.sources.code_imports import import_edges, sha_manifest
    from igpm_pem_spark.sources.repo_files import generate_repo_files

    spark = _session()
    entry = _entry()
    dense = entry._edges(spark, SF_DIR, entry.G_PARTS_SQL)
    n_edges = dense.count()
    scale = max(int(n_edges / 500), 20)
    rf = timed(
        spark, "ingest.generate_persist",
        fn=lambda: generate_repo_files(spark, n_repos=scale, files_per_repo=50).persist(),
    )
    timed(spark, "ingest.generate_count", fn=lambda: rf.count())
    timed(spark, "ingest.import_edges_count", fn=lambda: import_edges(rf).count())
    timed(spark, "ingest.sha_manifest_count", fn=lambda: sha_manifest(rf).count())
    print(json.dumps(_t))


def prof_pagerank():
    from igpm_pem_spark.operators.pagerank import pagerank

    spark = _session()
    entry = _entry()
    dense = entry._edges(spark, SF_DIR, entry.G_PARTS_SQL).persist()
    n = dense.count()
    print(f"edges={n}")
    t0 = time.time()
    pr = pagerank(spark, dense, tol=1e-6, max_iter=200, mode="delta", steps_per_commit=10)
    _t["pagerank_conv"] = round(time.time() - t0, 3)
    print(f"  pagerank_conv: {_t['pagerank_conv']}s supersteps={pr.supersteps}")
    per = [round(s.wall_time_sec, 3) for s in pr.stats]
    print(f"  per-commit walls: {per}")
    print(json.dumps(_t))


def prof_cc():
    from igpm_pem_spark.operators.components import connected_components

    spark = _session()
    entry = _entry()
    sparse = entry._edges(spark, SF_DIR, entry.G_SPARSE_SQL).persist()
    sparse.count()
    t0 = time.time()
    cc = connected_components(spark, sparse, steps_per_commit=4)
    _t["connected_comp"] = round(time.time() - t0, 3)
    print(f"  connected_comp: {_t['connected_comp']}s supersteps={cc.supersteps}")
    print(f"  per-commit walls: {[round(s.wall_time_sec, 3) for s in cc.stats]}")
    print(json.dumps(_t))


def prof_headline():
    """Every headline kernel once, sequential, same order as bench.py."""
    import subprocess

    for sec in ["pagerank", "cc", "ingest", "dedup", "simhash", "ann"]:
        print(f"== {sec} ==", flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__), sec], check=False)


def prof_registry_top(names=None):
    spark = _session()
    entry = _entry()
    sf001 = os.environ.get("SPARK_GRAFT_MANIFEST_SF", "/root/testdata/sf0.01")
    qs = entry.queries()
    if names is None:
        names = sys.argv[2:] or [
            "pagerank_incremental_replay", "pagerank_converged",
            "community_q_improvement", "graph_bowtie", "graph_percolation_curve",
            "emb_pca_project", "emb_dedup_clusters", "graph_condensation_levels",
            "graph_st_distance",
        ]
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf001).count()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "headline"
    {
        "ann": prof_ann,
        "dedup": prof_dedup,
        "simhash": prof_simhash,
        "ingest": prof_ingest,
        "pagerank": prof_pagerank,
        "cc": prof_cc,
        "headline": prof_headline,
        "registry_top": prof_registry_top,
    }[cmd]()
