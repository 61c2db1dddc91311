"""Runnable demo: CDC change stream → curated training corpus, with
every corpus-side artifact MAINTAINED rather than recomputed.

The reference stops at row replication (``example_usage.py``); this is
the same change-capture front end feeding the LLM-data path instead of
a replica, showing the engine's 100-TB posture end to end:

1. capture INSERT/UPDATE/DELETE into the audit log (the reference's
   trigger contract);
2. drain micro-batches through :class:`StreamingCorpusIngestor` with
   content-hash exact dedup, MinHash near-dup admission probed against
   the PERSISTED LSH index (``lsh_index_path`` — corpus text is never
   re-shingled), a maintained HLL distinct-content sketch
   (``stats_path``) and a maintained KMV content state
   (``kmv_stats_path``);
3. answer monitoring questions from the artifacts alone: distinct
   content ever admitted (HLL), content overlap against a second
   corpus (KMV intersect), near-dup rejections this run;
4. compact the index once stale versions accumulate.

Run: ``python examples/corpus_pipeline.py`` (temp dirs, prints a
report; asserts its own invariants so the test suite can drive it).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.api import CDCSystem, SnapshotTable
from cdc_system_spark.operators import lsh_index as LI
from cdc_system_spark.streaming import (
    StreamingCorpusIngestor,
    corpus_content_overlap,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _docs(spark: SparkSession, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def run_corpus_pipeline_demo(spark: SparkSession, root: str) -> dict:
    system = CDCSystem(spark, root, "pages")
    cap = system.setup_cdc(DOC_SCHEMA, key="doc_id")
    corpus = SnapshotTable(spark, os.path.join(root, "corpus"), DOC_SCHEMA)
    corpus.write(_docs(spark, [(1, "the quick brown fox jumps over the lazy dog")]))
    idx = os.path.join(root, "lsh_index")
    ing = StreamingCorpusIngestor(
        spark,
        cap.path,
        corpus,
        DOC_SCHEMA,
        checkpoint_path=os.path.join(root, "ckpt"),
        neardup_threshold=0.5,
        lsh_index_path=idx,
        stats_path=os.path.join(root, "hll"),
        kmv_stats_path=os.path.join(root, "kmv"),
    )

    # batch 0: one near-dup of the seed page (rejected), one exact dupe
    # pair within the batch (one admitted), one clean page
    cap.capture_insert(
        _docs(
            spark,
            [
                (10, "the quick brown fox jumps over the lazy dogs"),
                (11, "an entirely different page about query engines"),
                (12, "an entirely different page about query engines"),
                (13, "sparse matrices and how to store them"),
            ],
        )
    )
    ing.apply_batch(cap.read_log(), 0)
    rows0 = {r["doc_id"] for r in corpus.read().collect()}
    assert 10 not in rows0, "near-dup of the seed page must be rejected"
    assert (11 in rows0) != (12 in rows0), "exact within-batch dupe: one survives"
    assert 13 in rows0

    # batch 1: the seed page gets a light edit (same-id near-dup MUST
    # replace), one deletion
    mx0 = cap.read_log().agg(F.max("cdc_id")).collect()[0][0]
    cap.capture_update(
        _docs(spark, [(1, "the quick brown fox jumps over the lazy dog today")]),
        _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")]),
    )
    cap.capture_delete(_docs(spark, [(13, "sparse matrices and how to store them")]))
    ing.apply_batch(cap.read_log().filter(F.col("cdc_id") > mx0), 1)
    final = {r["doc_id"]: r["text"] for r in corpus.read().collect()}
    assert final[1].endswith("today"), "CDC UPDATE must replace its own row"
    assert 13 not in final

    # monitoring from artifacts alone — the corpus is never re-scanned
    distinct_est = ing.distinct_content_estimate()
    assert distinct_est > 0

    # a second (eval) corpus sharing one page: overlap answered from
    # the two KMV states, no corpus read
    eval_root = os.path.join(root, "eval")
    sys2 = CDCSystem(spark, eval_root, "pages")
    cap2 = sys2.setup_cdc(DOC_SCHEMA, key="doc_id")
    corpus2 = SnapshotTable(spark, os.path.join(eval_root, "corpus"), DOC_SCHEMA)
    corpus2.write(_docs(spark, []))
    ing2 = StreamingCorpusIngestor(
        spark,
        cap2.path,
        corpus2,
        DOC_SCHEMA,
        checkpoint_path=os.path.join(eval_root, "ckpt"),
        kmv_stats_path=os.path.join(eval_root, "kmv"),
    )
    cap2.capture_insert(
        _docs(
            spark,
            [
                (50, "an entirely different page about query engines"),
                (51, "held-out evaluation only content"),
            ],
        )
    )
    ing2.apply_batch(cap2.read_log(), 0)
    overlap = corpus_content_overlap(
        spark, os.path.join(root, "kmv"), os.path.join(eval_root, "kmv")
    ).collect()[0]
    assert overlap["intersect_est"] >= 1.0, "the shared page must be visible"

    # compaction: the edit left a stale version behind
    kept, dropped = LI.lsh_index_compact(spark, idx, corpus.read())
    assert dropped >= 1 and kept == len(final)

    return {
        "corpus": final,
        "distinct_content_est": distinct_est,
        "overlap_est": float(overlap["intersect_est"]),
        "index_kept": kept,
        "index_dropped": dropped,
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("corpus-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as root:
        report = run_corpus_pipeline_demo(spark, root)
        print("corpus:", report["corpus"])
        print("distinct content (HLL):", report["distinct_content_est"])
        print("content overlap vs eval corpus (KMV):", report["overlap_est"])
        print(
            "index compaction: kept", report["index_kept"],
            "dropped", report["index_dropped"],
        )


if __name__ == "__main__":
    main()
