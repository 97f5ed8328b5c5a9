"""Streaming curation for the EMBEDDING modality — pytest twins of the
text-loop suite (test_skew_and_windows.py): cross-batch rejection via
the persisted cosine-LSH index, index growth, content-keyed redelivery
idempotence, the never-shrink crash replay, online duplicate-family
clustering, and the stranded-vector divergence detector."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.operators import dedup, graph
from cloudfabric_eventsourcing_spark.streaming.curation import (
    curate_vector_batch_against_index,
    curate_vector_stream,
    vector_index_corpus_divergence,
)

DIMS, BITS = 4, 4
E1 = [1.0, 0.0, 0.0, 0.0]
E2 = [0.0, 1.0, 0.0, 0.0]
E3 = [0.0, 0.0, 1.0, 0.0]
E4 = [0.0, 0.0, 0.0, 1.0]
# same direction as E1 (cosine 1.0) at a different magnitude — scaling
# preserves both the hyperplane signs (same bucket) and the cosine
E1_SCALED = [2.5, 0.0, 0.0, 0.0]
VEC_SCHEMA = "vec_id long, embedding array<float>"


def _mk(spark, rows):
    return spark.createDataFrame(rows, VEC_SCHEMA)


def _ids(spark, path):
    return sorted(r["vec_id"] for r in spark.read.parquet(path).collect())


@pytest.mark.slow
def test_vector_curation_dedups_across_batches(spark, tmp_path):
    """Each batch dedups against the cosine index AND the index grows
    with accepted vectors, so a later batch cannot re-accept an earlier
    batch's embedding."""
    index_path = str(tmp_path / "cidx")
    corpus_out = str(tmp_path / "accepted")
    dedup.save_cosine_index(
        _mk(spark, [(1, E1)]), index_path, dims=DIMS, bits=BITS
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # batch a: dup of corpus vec 1 (same direction), novel vec 11
    _mk(spark, [(10, E1_SCALED), (11, E2)]).coalesce(1).write.parquet(
        str(src / "a")
    )
    # batch b: dup of batch-a's ACCEPTED 11 — must reject because the
    # index grew — plus a novel vec and an intra-batch twin pair 20/21
    _mk(
        spark, [(12, E2), (13, E3), (20, E4), (21, E4)]
    ).coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_vector_stream(
        stream, index_path, corpus_out, str(tmp_path / "ckpt"),
        threshold=0.95,
    )
    q.awaitTermination(120)
    assert _ids(spark, corpus_out) == [11, 13, 20]
    # the grown index rejects a re-send of every accepted vector
    hits = dedup.cosine_dedup_against_index(
        _mk(spark, [(30, E3)]), index_path, 0.95
    ).collect()
    assert {r["index_id"] for r in hits} == {13}


@pytest.mark.slow
def test_vector_curation_reingest_is_self_healing(spark, tmp_path):
    """Content-keyed idempotence: the probe runs include_same_id=True,
    so a redelivered vector (same id, same embedding) finds its own
    index row and rejects itself — even under a FRESH checkpoint where
    the position-keyed overwrite cannot help."""
    index_path = str(tmp_path / "cidx")
    corpus_out = str(tmp_path / "accepted")
    dedup.save_cosine_index(
        _mk(spark, [(1, E1)]), index_path, dims=DIMS, bits=BITS
    )
    src = tmp_path / "incoming"
    src.mkdir()
    _mk(spark, [(10, E2), (11, E3)]).coalesce(1).write.parquet(str(src / "a"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(VEC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = curate_vector_stream(
            stream, index_path, corpus_out, str(tmp_path / ckpt),
            threshold=0.95,
        )
        q.awaitTermination(120)

    run("ckpt1")
    assert _ids(spark, corpus_out) == [10, 11]
    run("ckpt2")  # full redelivery under a fresh checkpoint
    assert _ids(spark, corpus_out) == [10, 11]


@pytest.mark.slow
def test_vector_curation_partial_index_commit_never_shrinks_epoch(
    spark, tmp_path
):
    """The asymmetric crash (text-loop twin): corpus write committed but
    vec 11's index rows never landed.  On replay 10 self-rejects
    (content key) while 11 is re-accepted; a naive epoch overwrite
    would replace {10, 11} with {11}.  The never-shrink union keeps
    both."""
    index_path = str(tmp_path / "cidx")
    corpus_out = str(tmp_path / "accepted")
    dedup.save_cosine_index(
        _mk(spark, [(1, E1)]), index_path, dims=DIMS, bits=BITS
    )
    src = tmp_path / "incoming"
    src.mkdir()
    _mk(spark, [(10, E2), (11, E3)]).coalesce(1).write.parquet(str(src / "a"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(VEC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = curate_vector_stream(
            stream, index_path, corpus_out, ckpt, threshold=0.95
        )
        q.awaitTermination(120)

    ckpt = str(tmp_path / "ckpt")
    run(ckpt)
    assert _ids(spark, corpus_out) == [10, 11]

    # simulate the partial append: vec 11's index rows vanish
    vec_dir = f"{index_path}/vectors"
    kept = (
        spark.read.parquet(vec_dir)
        .where(F.col("vec_id") != 11)
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(vec_dir)
    kept.write.partitionBy("pbucket").parquet(vec_dir)

    # force the committed epoch to replay under the SAME checkpoint
    os.unlink(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    run(ckpt)
    # 10 was NOT dropped even though it self-rejected on replay
    assert _ids(spark, corpus_out) == [10, 11]


@pytest.mark.slow
def test_vector_curation_maintains_cluster_index(spark, tmp_path):
    """curate_vector_stream(clusters_path=...): duplicate families
    maintained online — rejected vectors keep provenance, intra-batch
    twins cluster, cross-batch chains connect through the accepted
    member; compaction preserves the labels."""
    index_path = str(tmp_path / "cidx")
    corpus_out = str(tmp_path / "accepted")
    clusters = str(tmp_path / "clusters")
    dedup.save_cosine_index(
        _mk(spark, [(1, E1)]), index_path, dims=DIMS, bits=BITS
    )
    src = tmp_path / "incoming"
    src.mkdir()
    # batch a: dup of corpus vec 1; novel 11
    _mk(spark, [(10, E1_SCALED), (11, E2)]).coalesce(1).write.parquet(
        str(src / "a")
    )
    # batch b: cross-batch chain 11-12, family {1,10} extended via 14,
    # intra-batch twins 20/21
    _mk(
        spark, [(12, E2), (14, E1), (20, E4), (21, E4)]
    ).coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_vector_stream(
        stream, index_path, corpus_out, str(tmp_path / "ckpt"),
        threshold=0.95, clusters_path=clusters, compact_every=1,
    )
    q.awaitTermination(120)
    assert not os.path.exists(f"{clusters}/remap")  # journal folded

    labels = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert labels[10] == labels[1] == labels[14] == 1
    assert labels[12] == labels[11] == 11
    assert labels[21] == labels[20] == 20
    graph.compact_cluster_index(spark, clusters)
    after = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert after == labels


def test_vector_index_corpus_divergence_detects_stranded(spark, tmp_path):
    """Externally-lost-epoch detector, embedding flavor: a vector whose
    index rows exist but whose corpus rows were deleted is reported."""
    index_path = str(tmp_path / "cidx")
    corpus_path = str(tmp_path / "corpus")
    dedup.save_cosine_index(
        _mk(spark, [(1, E1), (2, E2)]), index_path, dims=DIMS, bits=BITS
    )
    _mk(spark, [(1, E1)]).write.parquet(f"{corpus_path}/run=r1/epoch=0")
    stranded = vector_index_corpus_divergence(
        spark, index_path, corpus_path
    ).collect()
    assert {r["vec_id"] for r in stranded} == {2}
    # healthy pipeline: empty report
    _mk(spark, [(2, E2)]).write.parquet(f"{corpus_path}/run=r1/epoch=1")
    assert (
        vector_index_corpus_divergence(spark, index_path, corpus_path).count()
        == 0
    )


def test_vector_divergence_cold_index_id_type_matches(spark, tmp_path):
    """r8 advice pin: the cold-index branch's empty frame must carry the
    SAME id type the populated branch would (long here, via the corpus
    schema) so callers can union/join the two branches; with no corpus
    either, the id_type parameter (default long) applies."""
    index_path = str(tmp_path / "cidx")
    corpus_path = str(tmp_path / "corpus")
    dedup.save_cosine_index(
        _mk(spark, []), index_path, dims=DIMS, bits=BITS
    )
    cold = vector_index_corpus_divergence(spark, index_path, corpus_path)
    assert cold.schema["vec_id"].dataType.simpleString() == "bigint"
    assert cold.count() == 0
    # with a readable corpus, its id type wins outright
    _mk(spark, [(1, E1)]).write.parquet(f"{corpus_path}/run=r1/epoch=0")
    typed = vector_index_corpus_divergence(spark, index_path, corpus_path)
    assert typed.schema["vec_id"].dataType.simpleString() == "bigint"
    # the two branches union cleanly (the advice's failing case)
    assert typed.unionByName(cold).count() == 0


def test_cosine_index_cross_type_probe_uses_stored_schema(spark, tmp_path):
    """r8 advice pin: an index persisted with array<double> embeddings
    probed by an array<float> batch must keep working — stored types win
    via schema inference whenever data files exist (the expressions cast
    to double anyway); the explicit batch schema is only the cold-start
    fallback."""
    index_path = str(tmp_path / "cidx")
    stored = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    dedup.save_cosine_index(stored, index_path, dims=DIMS, bits=BITS)
    hits = dedup.cosine_dedup_against_index(
        _mk(spark, [(10, E1_SCALED)]), index_path, 0.95
    ).collect()
    assert [(r["new_id"], r["index_id"], r["cosine"]) for r in hits] == [
        (10, 1, 1.0)
    ]


def test_vector_batch_probe_plan_partition_prunes(spark, tmp_path):
    """Scale pin: the batch probe's corpus scan is pruned to the probed
    bucket partitions (PartitionFilters at the file listing), and the
    batch side broadcasts — nothing corpus-sized shuffles."""
    index_path = str(tmp_path / "cidx")
    corpus = _mk(spark, [(i, [float(i % 7 + 1), float(i % 3), 1.0, 0.0]) for i in range(64)])
    dedup.save_cosine_index(corpus, index_path, dims=DIMS, bits=BITS)
    batch = _mk(spark, [(1000, E1)])
    accepted = curate_vector_batch_against_index(
        batch, index_path, threshold=0.95
    )
    plan = accepted._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [pbucket" in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.slow
def test_close_rejected_families_merges_text_families(spark, tmp_path):
    """The cluster index's documented scope limit, closed offline: R1
    and R2 are rejected in different batches against DIFFERENT accepted
    docs (A and B), and their own similarity runs through no accepted
    member — so the stream leaves two families.  The closure pass over
    the rejected set finds the R1-R2 edge and merges them.  Re-running
    is idempotent."""
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        close_rejected_families,
        curate_stream,
    )

    w = lambda pre, lo, hi: " ".join(f"{pre}{i}" for i in range(lo, hi))  # noqa: E731
    text_a = w("a", 0, 10)                                # {a0..a9}
    text_r1 = w("a", 0, 8) + " c0 c1"                     # J(A,R1)=8/12≈0.67
    text_r2 = w("a", 0, 6) + " c0 c1 b0 b1"               # J(R1,R2)=8/12; J(A,R2)=6/14
    text_b = w("a", 0, 5) + " c0 c1 b0 b1 d0"             # J(B,R2)=9/11; J(B,R1)=7/13

    index_path = str(tmp_path / "index")
    corpus_out = str(tmp_path / "accepted")
    clusters = str(tmp_path / "clusters")
    dedup.save_minhash_index(
        spark.createDataFrame([(1, text_a), (2, text_b)], ["doc_id", "text"]),
        index_path,
    )
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame([(10, text_r1)], ["doc_id", "text"]).coalesce(
        1
    ).write.parquet(str(src / "a"))
    spark.createDataFrame([(11, text_r2)], ["doc_id", "text"]).coalesce(
        1
    ).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_stream(
        stream, index_path, corpus_out, str(tmp_path / "ckpt"),
        threshold=0.6, clusters_path=clusters,
    )
    q.awaitTermination(120)
    # both rejected; stream leaves TWO families (the scope limit)
    assert not os.path.exists(corpus_out)  # nothing accepted, no epoch dir
    labels = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert labels[10] == labels[1] and labels[11] == labels[2]
    assert labels[10] != labels[11]

    rejected = spark.createDataFrame(
        [(10, text_r1), (11, text_r2)], ["doc_id", "text"]
    )
    report = close_rejected_families(
        rejected, index_path, clusters, threshold=0.6
    )
    assert report["merges"] >= 1
    merged = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert len({merged[1], merged[2], merged[10], merged[11]}) == 1
    # idempotent re-run: same edges, no further merges
    again = close_rejected_families(
        rejected, index_path, clusters, threshold=0.6
    )
    assert again["merges"] == 0 and again["new_nodes"] == 0


@pytest.mark.slow
def test_close_rejected_vector_families_merges(spark, tmp_path):
    """Embedding twin: an angle chain A–R1–R2–B where each rejected
    vector matches only its neighbor.  The stream leaves {A,R1} and
    {B,R2}; the closure pass merges them through the R1-R2 edge."""
    import math

    from cloudfabric_eventsourcing_spark.streaming.curation import (
        close_rejected_vector_families,
        curate_vector_stream,
    )

    def rot(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    vec_a, vec_r1, vec_r2, vec_b = rot(0), rot(14), rot(28), rot(42)
    # threshold 0.95 = cos(18.2°): neighbors (14° apart) match, skips
    # (28°, cos=0.88) and A-B (42°) do not
    index_path = str(tmp_path / "cidx")
    corpus_out = str(tmp_path / "accepted")
    clusters = str(tmp_path / "clusters")
    dedup.save_cosine_index(
        _mk(spark, [(1, vec_a), (2, vec_b)]), index_path, dims=DIMS, bits=BITS
    )
    src = tmp_path / "incoming"
    src.mkdir()
    _mk(spark, [(10, vec_r1)]).coalesce(1).write.parquet(str(src / "a"))
    _mk(spark, [(11, vec_r2)]).coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_vector_stream(
        stream, index_path, corpus_out, str(tmp_path / "ckpt"),
        threshold=0.95, clusters_path=clusters,
    )
    q.awaitTermination(120)
    assert not os.path.exists(corpus_out)  # nothing accepted, no epoch dir
    labels = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert labels[10] == labels[1] and labels[11] == labels[2]
    assert labels[10] != labels[11]

    report = close_rejected_vector_families(
        _mk(spark, [(10, vec_r1), (11, vec_r2)]), index_path, clusters,
        threshold=0.95,
    )
    assert report["merges"] >= 1
    merged = {
        r["node"]: r["component"]
        for r in graph.load_cluster_labels(spark, clusters).collect()
    }
    assert len({merged[1], merged[2], merged[10], merged[11]}) == 1


def test_vector_divergence_on_cold_index(spark, tmp_path):
    """A cold-started (empty) cosine index has no data files in its
    vectors dir — the divergence detector must report nothing stranded
    instead of failing schema inference."""
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        vector_index_corpus_divergence,
    )

    path = str(tmp_path / "cidx")
    empty = spark.createDataFrame([], VEC_SCHEMA)
    dedup.save_cosine_index(empty, path, dims=DIMS, bits=BITS)
    assert (
        vector_index_corpus_divergence(
            spark, path, str(tmp_path / "no_corpus")
        ).count()
        == 0
    )


def test_image_neardup_pairs_across_reencodes(spark):
    """Images become a first-class dedup modality: the same pixels
    re-encoded (lossless PNG vs lossy JPEG) land ~identical feature
    vectors and pair up; a different image does not."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal

    # structurally distinct LUMINANCE DISTRIBUTIONS (the feature is a
    # histogram): a full-range gradient vs a dark low-contrast image
    img_a = np.zeros((32, 48, 3), np.uint8)
    img_a[...] = (np.arange(48)[None, :, None] * 255) // 47
    img_b = np.full((32, 48, 3), 30, np.uint8)
    img_b[8:16, 8:24] = 55
    rows = [
        (1, "image", bytearray(codecs.encode_png(48, 32, 3, img_a.tobytes())),
         None),
        (2, "image",
         bytearray(codecs.encode_jpeg(48, 32, 3, img_a.tobytes(), quality=95)),
         None),
        (3, "image", bytearray(codecs.encode_png(48, 32, 3, img_b.tobytes())),
         None),
        (4, "image", None, None),  # null row tolerated
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in multimodal.image_neardup_pairs(media, threshold=0.995).collect()
    }
    assert pairs == {(1, 2)}


@pytest.mark.slow
def test_image_stream_curation_composes_with_vector_loop(spark, tmp_path):
    """End-to-end multimodal curation via curate_image_stream (the
    production composition — on_error="skip", NOT the job-killing raise
    default): a STREAM of image bytes is curated by perceptual near-dup,
    growing the persisted cosine index.  A JPEG re-encode of an
    already-accepted PNG arriving in a LATER batch is rejected."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_image_stream,
    )

    img_a = np.zeros((32, 48, 3), np.uint8)
    img_a[...] = (np.arange(48)[None, :, None] * 255) // 47
    img_b = np.full((32, 48, 3), 30, np.uint8)
    img_b[8:16, 8:24] = 55
    png_a = codecs.encode_png(48, 32, 3, img_a.tobytes())
    jpg_a = codecs.encode_jpeg(48, 32, 3, img_a.tobytes(), quality=95)
    png_b = codecs.encode_png(48, 32, 3, img_b.tobytes())

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(10, "image", bytearray(png_a), None)], multimodal.MEDIA_SCHEMA
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(11, "image", bytearray(jpg_a), None),   # re-encode of 10: reject
         (12, "image", bytearray(png_b), None)],  # novel: accept
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b"))

    index_path = str(tmp_path / "cidx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    dedup.save_cosine_index(empty, index_path, dims=16, bits=8)

    stream = (
        spark.readStream.schema(multimodal.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_image_stream(
        stream, index_path, str(tmp_path / "corpus"), str(tmp_path / "ckpt"),
        threshold=0.995,
    )
    q.awaitTermination(120)
    accepted = sorted(
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert accepted == [10, 12]


@pytest.mark.slow
def test_image_stream_corrupt_blob_skipped_and_quarantined(spark, tmp_path):
    """r8 verdict #1 closed: a corrupt JPEG in the MIDDLE batch of an
    image curation stream must not kill the streaming query — the batch
    completes, its good images are accepted, and the quarantine dir
    holds exactly the bad blob's row (run/epoch-keyed).  A replay under
    the same checkpoint overwrites the same quarantine epoch (no
    duplicate report rows)."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_image_stream,
    )

    img_a = np.zeros((32, 48, 3), np.uint8)
    img_a[...] = (np.arange(48)[None, :, None] * 255) // 47
    img_b = np.full((32, 48, 3), 30, np.uint8)
    img_b[8:16, 8:24] = 55
    png_a = codecs.encode_png(48, 32, 3, img_a.tobytes())
    png_b = codecs.encode_png(48, 32, 3, img_b.tobytes())
    corrupt = codecs.encode_jpeg(48, 32, 3, img_a.tobytes())[:40]  # truncated

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(10, "image", bytearray(png_a), None)], multimodal.MEDIA_SCHEMA
    ).coalesce(1).write.parquet(str(src / "a"))
    # middle batch: one corrupt blob + one good novel image
    spark.createDataFrame(
        [(11, "image", bytearray(corrupt), None),
         (12, "image", bytearray(png_b), None)],
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b"))

    index_path = str(tmp_path / "cidx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    dedup.save_cosine_index(empty, index_path, dims=16, bits=8)
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(multimodal.MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = curate_image_stream(
            stream, index_path, corpus, ckpt,
            threshold=0.995, quarantine_path=quarantine,
        )
        q.awaitTermination(120)

    run()
    accepted = sorted(
        r["vec_id"] for r in spark.read.parquet(corpus).collect()
    )
    assert accepted == [10, 12]  # query survived; good images accepted
    bad = spark.read.parquet(quarantine).collect()
    assert len(bad) == 1
    assert (bad[0]["media_id"], bad[0]["kind"]) == (11, "image")
    assert bad[0]["error"] and bad[0]["n_bytes"] == 40

    # replay the corrupt epoch under the SAME checkpoint: the report is
    # overwritten in place, not duplicated
    os.unlink(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    run()
    assert spark.read.parquet(quarantine).count() == 1
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus).collect()
    ) == [10, 12]


@pytest.mark.slow
def test_audio_stream_curation_skips_and_quarantines(spark, tmp_path):
    """curate_audio_stream end-to-end: a later-batch gain-change
    re-encode of an accepted WAV is rejected by the cosine index, a
    corrupt WAV in the same batch is skipped (query survives) and
    quarantined, and the novel signal is accepted."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_audio_stream,
    )

    sr = 8000
    t = np.arange(sr) / sr
    sig_a = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(
        2 * np.pi * 1320 * t
    )
    sig_b = 0.5 * np.sin(2 * np.pi * 3000 * t) + 0.4 * np.sin(
        2 * np.pi * 200 * t
    )

    def wav16(sig, gain=1.0):
        pcm = np.clip(sig * gain * 32000, -32768, 32767).astype(np.int16)
        return codecs.encode_wav(sr, 1, 2, pcm.tobytes())

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(1, "audio", bytearray(wav16(sig_a)), None)], multimodal.MEDIA_SCHEMA
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(2, "audio", bytearray(wav16(sig_a, 0.4)), None),  # re-encode: reject
         (3, "audio", bytearray(wav16(sig_b)), None),       # novel: accept
         (4, "audio", bytearray(b"RIFFnope"), None)],       # corrupt: skip
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b"))

    index_path = str(tmp_path / "cidx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    dedup.save_cosine_index(empty, index_path, dims=16, bits=8)
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")

    stream = (
        spark.readStream.schema(multimodal.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_audio_stream(
        stream, index_path, corpus, str(tmp_path / "ckpt"),
        threshold=0.99, quarantine_path=quarantine,
    )
    q.awaitTermination(120)
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus).collect()
    ) == [1, 3]
    bad = spark.read.parquet(quarantine).collect()
    assert [(r["media_id"], r["kind"]) for r in bad] == [(4, "audio")]


@pytest.mark.slow
def test_video_stream_curation_rejects_container_swap(spark, tmp_path):
    """curate_video_stream end-to-end (the modality triangle's third
    side): a later-batch AVI re-mux of an accepted MP4's frames is
    rejected by the cosine index (container-invariant dedup), a corrupt
    container in the same batch is skipped (the query survives) and
    quarantined, and a novel video is accepted."""
    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_video_stream,
    )

    def frames(v):
        return [bytes([v]) * (16 * 16 * 3)] * 3

    mp4_a = codecs.encode_mp4(16, 16, 10.0, frames(40), quality=95)
    avi_a = codecs.encode_avi(
        16, 16, 10.0, frames(40), codec="mjpeg", quality=95
    )
    mp4_b = codecs.encode_mp4(16, 16, 10.0, frames(200), quality=95)
    corrupt = mp4_a[:30]  # truncated mid-ftyp

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(20, "video", bytearray(mp4_a), None)], multimodal.MEDIA_SCHEMA
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(21, "video", bytearray(corrupt), None),  # corrupt: skip
         (22, "video", bytearray(avi_a), None),    # container swap: reject
         (23, "video", bytearray(mp4_b), None)],   # novel: accept
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b"))

    index_path = str(tmp_path / "cidx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    dedup.save_cosine_index(empty, index_path, dims=16, bits=8)
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")

    stream = (
        spark.readStream.schema(multimodal.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_video_stream(
        stream, index_path, corpus, str(tmp_path / "ckpt"),
        threshold=0.995, quarantine_path=quarantine,
    )
    q.awaitTermination(120)
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus).collect()
    ) == [20, 23]
    bad = spark.read.parquet(quarantine).collect()
    assert [(r["media_id"], r["kind"]) for r in bad] == [(21, "video")]


def test_audio_neardup_pairs_across_reencodes(spark):
    """Audio as a dedup modality: the same signal re-encoded (16-bit vs
    8-bit PCM, different gain) pairs up via the spectral-band embedding;
    a different signal does not; null content tolerated."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, multimodal

    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    sig_a = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(
        2 * np.pi * 1320 * t
    )
    sig_b = 0.5 * np.sin(2 * np.pi * 3000 * t) + 0.4 * np.sin(
        2 * np.pi * 200 * t
    )

    def wav16(sig, gain=1.0):
        pcm = np.clip(sig * gain * 32000, -32768, 32767).astype(np.int16)
        return codecs.encode_wav(sr, 1, 2, pcm.tobytes())

    def wav8(sig):
        pcm = np.clip(sig * 120 + 128, 0, 255).astype(np.uint8)
        return codecs.encode_wav(sr, 1, 1, pcm.tobytes())

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav16(sig_a)), None),
            (2, "audio", bytearray(wav8(sig_a)), None),       # re-encode of 1
            (3, "audio", bytearray(wav16(sig_a, 0.4)), None), # gain change of 1
            (4, "audio", bytearray(wav16(sig_b)), None),      # different
            (5, "audio", None, None),                         # null tolerated
        ],
        multimodal.MEDIA_SCHEMA,
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in multimodal.audio_neardup_pairs(media, threshold=0.99).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}


@pytest.mark.slow
def test_image_dhash_stream_curation(spark, tmp_path):
    """The perceptual-hash curation loop end-to-end: a 2x nearest
    upscale of an accepted image arriving in a LATER batch is rejected
    by the persisted Hamming index (resize-invariant dHash), a corrupt
    blob is skipped and quarantined without killing the query, the
    index cold-starts from an empty frame, and a fresh-checkpoint
    replay adds nothing."""
    import numpy as np

    from cloudfabric_eventsourcing_spark.operators import codecs, dedup
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_image_dhash_stream,
    )

    def render(pat, scale=1):
        px = np.zeros((8, 9), np.uint8)
        for r in range(8):
            v = 128
            px[r, 0] = v
            for c in range(8):
                v += 8 if (pat >> (r * 8 + c)) & 1 else -8
                px[r, c + 1] = v
        big = np.repeat(np.repeat(px, scale, 0), scale, 1)
        rgb = np.repeat(big[..., None], 3, axis=2)
        return codecs.encode_png(9 * scale, 8 * scale, 3, rgb.tobytes())

    pat_a, pat_b, pat_c = 0x0123456789ABCDEF, 0xF0E1D2C3B4A59687, 0x5A5A5A5AA5A5A5A5

    index_path = str(tmp_path / "hidx")
    corpus_out = str(tmp_path / "accepted")
    quarantine = str(tmp_path / "quarantine")
    empty = spark.createDataFrame([], "media_id long, dhash long")
    dedup.save_hamming_index(empty, index_path)

    src = tmp_path / "incoming"
    src.mkdir()
    from cloudfabric_eventsourcing_spark.operators import multimodal
    spark.createDataFrame(
        [
            (1, "image", bytearray(render(pat_a)), None),
            (2, "image", bytearray(b"\x89PNG\r\n\x1a\njunk"), None),
            (3, "image", bytearray(render(pat_b)), None),
        ],
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [
            (10, "image", bytearray(render(pat_a, scale=2)), None),  # dup of 1
            (11, "image", bytearray(render(pat_c)), None),           # novel
        ],
        multimodal.MEDIA_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(multimodal.MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = curate_image_dhash_stream(
            stream, index_path, corpus_out, str(tmp_path / ckpt),
            quarantine_path=quarantine,
        )
        q.awaitTermination(120)

    run("ckpt1")
    accepted = {
        r["media_id"] for r in spark.read.parquet(corpus_out).collect()
    }
    assert accepted == {1, 3, 11}  # 2 corrupt, 10 perceptual dup of 1
    bad = spark.read.parquet(quarantine).collect()
    assert {r["media_id"] for r in bad} == {2}
    # the grown index rejects a re-probe of every accepted hash
    probe = spark.createDataFrame(
        [(99, int(np.int64(np.uint64(pat_c))))], "media_id long, dhash long"
    )
    hits = dedup.hamming_dedup_against_index(
        probe, index_path, max_hamming=0
    ).collect()
    assert {r["index_id"] for r in hits} == {11}
    # fresh-checkpoint replay: everything already indexed, corpus stable
    n = spark.read.parquet(corpus_out).count()
    run("ckpt2")
    assert spark.read.parquet(corpus_out).count() == n


@pytest.mark.slow
def test_simhash_stream_curation_via_hamming_loop(spark, tmp_path):
    """The generic fingerprint loop covers TEXT too: curate_hamming_stream
    with batch_transform = simhash_signatures dedups a document stream by
    SimHash — a lightly-edited re-send of an accepted doc (Hamming <= 3
    at 64 bits) is rejected cross-batch by the persisted index."""
    from cloudfabric_eventsourcing_spark.operators import dedup
    from cloudfabric_eventsourcing_spark.streaming.curation import (
        curate_hamming_stream,
    )

    # a 300-token doc: one appended token shifts each bit's vote by 1,
    # flipping only near-tie positions (measured: 2 bits here, vs ~27
    # for an unrelated doc — deterministic, xxhash64-keyed)
    import random
    rng = random.Random(5)
    vocab = [f"tok{i}" for i in range(400)]
    base = " ".join(vocab[rng.randrange(400)] for _ in range(300))
    near = base + " zq1"
    far = " ".join(vocab[rng.randrange(400)] for _ in range(300))

    index_path = str(tmp_path / "hidx")
    corpus_out = str(tmp_path / "accepted")
    empty = spark.createDataFrame([], "doc_id long, simhash long")
    dedup.save_hamming_index(
        empty, index_path, hash_col="simhash", id_col="doc_id"
    )

    # precondition: the edit really lands within Hamming 3
    sigs = dedup.simhash_signatures(
        spark.createDataFrame([(1, base), (2, near), (3, far)],
                              "doc_id long, text string")
    ).collect()
    h = {r["id"]: r["simhash"] for r in sigs}
    d_near = bin((h[1] ^ h[2]) & (2**64 - 1)).count("1")
    d_far = bin((h[1] ^ h[3]) & (2**64 - 1)).count("1")
    assert d_near <= 3 < d_far, (d_near, d_far)

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(2, near), (3, far)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b"))

    def hashes(batch):
        return dedup.simhash_signatures(batch).select(
            F.col("id").alias("doc_id"), "simhash"
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_hamming_stream(
        stream, index_path, corpus_out, str(tmp_path / "ckpt"),
        max_hamming=3, hash_col="simhash", id_col="doc_id",
        batch_transform=hashes,
    )
    q.awaitTermination(120)
    accepted = {
        r["doc_id"] for r in spark.read.parquet(corpus_out).collect()
    }
    assert accepted == {1, 3}  # 2 is the near-dup re-send
