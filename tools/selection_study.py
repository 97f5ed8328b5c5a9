"""Scale study for the round-9 data-selection family: ExactSubstr
spans, SemDeDup, DSIR, the learned quality classifier, and BPE
training/encoding, measured against a (possibly scaled) sf directory.

Reproduces the PLANS.md "Round-9 continuation" measurements:

    python tools/make_scaled_sf.py 10 /tmp/spark_graft_sf1
    python tools/selection_study.py /tmp/spark_graft_sf1

Prints one JSON line per operator with wall seconds and the headline
output cardinality, so a future round can re-check the scaling claims
(span detection linear in corpus tokens; SemDeDup bounded by cluster
sizes; DSIR two 4096-cell aggs + a broadcast join; classifier scoring
map-only; BPE iterations touching only word TYPES) on the same data
the claims were made on.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.operators.bpe import (  # noqa: E402
    bpe_encode,
    train_bpe,
)
from cloudfabric_eventsourcing_spark.operators.classify import (  # noqa: E402
    pareto_quality_filter,
    score_quality,
    train_quality_classifier,
)
from cloudfabric_eventsourcing_spark.operators.dedup import (  # noqa: E402
    duplicated_spans,
    semantic_dedup,
)
from cloudfabric_eventsourcing_spark.operators.sampling import (  # noqa: E402
    dsir_log_weights,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = build_session(app_name="selection-study")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()

    def report(name: str, t0: float, **extra) -> None:
        print(
            json.dumps(
                {"op": name, "sec": round(time.time() - t0, 1), **extra}
            ),
            flush=True,
        )

    t = time.time()
    spans = duplicated_spans(docs, k=8, min_count=2).count()
    report("duplicated_spans", t, k=8, docs=n_docs, spans=spans)

    # k ~ sqrt(N), deterministic lowest-id centroids (the p18 recipe)
    k = max(8, int(n_vecs ** 0.5 / 31) * 31)
    cents = emb.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    t = time.time()
    kept = semantic_dedup(emb, cents, threshold=0.35).where("kept").count()
    report("semantic_dedup", t, k=k, vecs=n_vecs, kept=kept)

    t = time.time()
    w = dsir_log_weights(docs, docs.where("lang = 'en'"))
    rows = w.count()
    report("dsir_log_weights", t, docs=rows)

    pos = docs.where("lang = 'en'").limit(5000)
    neg = docs.where("lang != 'en'").limit(5000)
    t = time.time()
    model = train_quality_classifier(pos, neg)
    report("classifier_fit", t, sample=10_000)
    t = time.time()
    survived = pareto_quality_filter(score_quality(docs, model)).count()
    report("classifier_score_filter", t, docs=n_docs, kept=survived)

    t = time.time()
    merges = train_bpe(docs, n_merges=60, checkpoint_every=10)
    report("bpe_train", t, merges=len(merges))
    t = time.time()
    subwords = (
        bpe_encode(docs, merges)
        .selectExpr("sum(size(bpe_tokens)) s")
        .collect()[0]["s"]
    )
    report("bpe_encode", t, docs=n_docs, subwords=subwords)

    # round-10 additions: quantization (map-only — should scale with
    # I/O alone), integer top-k (scan + TakeOrdered), unigram surprisal
    # (word-type groupBy + broadcast join + per-doc sum)
    from cloudfabric_eventsourcing_spark.operators.similarity import (
        quantize_embeddings,
        quantized_topk,
    )
    from cloudfabric_eventsourcing_spark.operators.text import (
        unigram_surprisal,
    )

    t = time.time()
    qz = quantize_embeddings(emb)
    qz.write.format("noop").mode("overwrite").save()
    report("quantize_embeddings", t, vecs=n_vecs)
    query_q = qz.where("vec_id = 0").collect()[0]["qvec"]
    t = time.time()
    quantized_topk(qz, query_q, k=20).collect()
    report("quantized_topk", t, vecs=n_vecs)
    t = time.time()
    unigram_surprisal(docs).write.format("noop").mode("overwrite").save()
    report("unigram_surprisal", t, docs=n_docs)

    # round-11 additions (r10 verdict stretch #10): the NO-ORACLE ML
    # components get the same per-scale regression rows as the oracle
    # queries — held-out quality, not just wall seconds, so silent
    # drift (a feature-hashing change, a regularization bump, corpus
    # skew at scale) becomes driver-visible.
    #
    # The LID row uses a PLANTED 4-language corpus sized to the sf
    # (the real corpus's text is identical token soup across lang
    # labels — unlearnable by construction; measured held-out accuracy
    # there is chance ~0.2, i.e. pure noise).  The corpus is generated
    # DISTRIBUTED from doc_id arithmetic: word j of doc i is
    # vocab[lang][xxhash64(i, j) % |vocab|] — deterministic across
    # runs and engines, no driver-side loop.
    from cloudfabric_eventsourcing_spark.operators.classify import (
        predict_language,
        train_language_id,
    )

    vocab = {
        "en": ("the quick brown fox jumps over lazy dogs while many "
               "people watch the evening news and drink warm tea").split(),
        "de": ("der schnelle braune Fuchs springt über faule Hunde "
               "während viele Leute abends Nachrichten schauen und "
               "warmen Tee trinken größe straße müde schön").split(),
        "fr": ("le renard brun rapide saute par-dessus les chiens "
               "paresseux pendant que beaucoup de gens regardent les "
               "nouvelles du soir et boivent du thé chaud être déjà").split(),
        "es": ("el zorro marrón rápido salta sobre los perros perezosos "
               "mientras mucha gente mira las noticias de la noche y "
               "bebe té caliente mañana niño señor además").split(),
    }
    langs = sorted(vocab)
    lang_col = F.element_at(
        F.array(*[F.lit(l) for l in langs]),
        (F.col("doc_id") % len(langs)).cast("int") + 1,
    )
    word_arrs = {
        l: F.array(*[F.lit(w) for w in vocab[l]]) for l in langs
    }
    words = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda j: F.element_at(
            F.coalesce(*[
                F.when(lang_col == l, word_arrs[l]) for l in langs
            ]),
            F.pmod(
                F.xxhash64(F.col("doc_id"), j),
                F.when(lang_col == F.lit("x"), 0).otherwise(
                    F.size(F.coalesce(*[
                        F.when(lang_col == l, word_arrs[l]) for l in langs
                    ]))
                ),
            ).cast("int") + 1,
        ),
    )
    planted = docs.select(
        "doc_id",
        lang_col.alias("lang"),
        F.array_join(words, " ").alias("text"),
    )
    is_test = F.abs(F.xxhash64("doc_id")) % 5 == 0
    lid_train = planted.where(~is_test).limit(8000)
    lid_test = planted.where(is_test)
    t = time.time()
    lid_model = train_language_id(lid_train)
    report("language_id_fit", t, sample=lid_train.count())
    t = time.time()
    agg = (
        predict_language(lid_test, lid_model)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("lang_pred") == F.col("lang")).cast("int")).alias(
                "hit"
            ),
        )
        .collect()
    )
    per_lang = {r["lang"]: round(r["hit"] / r["n"], 4) for r in agg}
    total = sum(r["n"] for r in agg)
    acc = round(sum(r["hit"] for r in agg) / total, 4) if total else None
    report(
        "language_id_heldout", t,
        test_docs=total, accuracy=acc, per_lang_precision=per_lang,
    )

    # quality classifier held-out accuracy on the same split (en vs
    # non-en proxy labels, the train_quality_classifier recipe above)
    real_test = docs.where(is_test)
    t = time.time()
    ho = score_quality(real_test, model).withColumn(
        "__want", (F.col("lang") == "en").cast("int")
    )
    cls = ho.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("quality_prob") >= 0.5).cast("int") == F.col("__want")).cast(
                "int"
            )
        ).alias("hit"),
    ).collect()[0]
    report(
        "quality_classifier_heldout", t,
        test_docs=cls["n"],
        accuracy=round(cls["hit"] / cls["n"], 4) if cls["n"] else None,
    )
    spark.stop()


if __name__ == "__main__":
    main()
