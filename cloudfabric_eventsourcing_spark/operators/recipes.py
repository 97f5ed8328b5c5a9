"""The end-to-end pretraining-data curation recipe: the composition a
real pipeline runs nightly, wired from the operators this package
already ships — so the integration (column contracts, null flows, row
accounting) is itself a tested artifact rather than something every
deployment reinvents.

Stage order follows the published pipelines (CCNet, RefinedWeb,
Dolma): cheap row-local filters first (language, heuristic quality) so
every later corpus-wide shuffle sees fewer rows; then corpus-level
text surgery (boilerplate lines, exact-substring span cutting, PII);
then the near-dup family (exact, MinHash-LSH); then benchmark
decontamination; optionally a learned quality gate last (it is the
most expensive signal and benefits from the smallest candidate set).

Every stage is optional via its config knob; each drop stage records
its row count in the returned report so `sum(drops) + survivors ==
input` is checkable — the same accounting contract as corpus_report.

Scale notes are per-operator (see each operator's docstring); the
recipe adds none of its own shuffles — it only sequences them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.operators import dedup as _dedup
from cloudfabric_eventsourcing_spark.operators import text as _text


@dataclass
class CurationConfig:
    """Knobs for standard_curation, defaulting to the published
    pipelines' shapes.  Set a stage's knob to None/False to skip it."""

    keep_langs: Optional[Sequence[str]] = ("en",)
    min_quality: Optional[float] = 0.3
    boilerplate_min_docs: Optional[int] = 25
    dup_span_k: Optional[int] = 8          # None skips span cutting
    dup_span_max_ratio: float = 0.8        # docs above this drop whole
    redact_pii: bool = True
    minhash_threshold: Optional[float] = 0.9
    decontam_ngram: Optional[int] = 8
    quality_model: object = None           # fitted classify model
    quality_floor: float = 0.5
    id_col: str = "doc_id"
    text_col: str = "text"


def standard_curation(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    test_sets: Optional[DataFrame] = None,
) -> tuple[DataFrame, dict]:
    """Run the full curation recipe; returns (clean_frame, report).

    The clean frame keeps the input's id column plus the curated text
    under the input's text column name (line/span/PII surgery applied
    in place).  The report maps stage -> rows dropped BY that stage,
    plus 'input' and 'survivors'; drops always sum."""
    id_col, text_col = config.id_col, config.text_col
    report: dict = {"input": df.count()}
    cur = df.select(id_col, text_col)

    def count_drop(stage: str, nxt: DataFrame) -> DataFrame:
        n = nxt.count()
        report[stage] = report.get("__prev", report["input"]) - n
        report["__prev"] = n
        return nxt

    report["__prev"] = report["input"]
    if config.keep_langs is not None:
        lang = _text.with_language_id(cur, text_col=text_col)
        cur = count_drop(
            "language_filter",
            lang.where(F.col("lang_pred").isin(*config.keep_langs)).select(
                id_col, text_col
            ),
        )
    if config.min_quality is not None:
        q = _text.with_quality_score(cur, text_col=text_col)
        cur = count_drop(
            "quality_heuristic",
            q.where(F.col("quality") >= config.min_quality).select(
                id_col, text_col
            ),
        )
    if config.boilerplate_min_docs is not None:
        cleaned = _text.remove_boilerplate_lines(
            cur,
            min_docs=config.boilerplate_min_docs,
            text_col=text_col,
            id_col=id_col,
        )
        cur = cleaned.select(
            id_col, F.col("clean").alias(text_col)
        )
        report["boilerplate_lines"] = 0  # surgery, not a drop stage
    if config.dup_span_k is not None:
        spans = _dedup.duplicated_spans(
            cur, k=config.dup_span_k, text_col=text_col, id_col=id_col
        )
        stats = _dedup.duplicated_span_stats(
            cur, spans=spans, text_col=text_col, id_col=id_col
        )
        heavy = stats.where(
            F.col("dup_ratio") > config.dup_span_max_ratio
        ).select(id_col)
        cur = count_drop(
            "duplicated_span_heavy", cur.join(heavy, id_col, "left_anti")
        )
        to_cut = spans.join(heavy, id_col, "left_anti")
        cur = _dedup.remove_duplicated_spans(
            cur, spans=to_cut, text_col=text_col, id_col=id_col
        ).select(id_col, F.col("clean").alias(text_col))
    if config.redact_pii:
        cur = _text.with_redacted_text(cur, text_col=text_col).select(
            id_col, F.col("text_redacted").alias(text_col)
        )
    # exact dedup before LSH: cheap, and shrinks the banding input
    if config.minhash_threshold is not None:
        reps = _dedup.exact_dedup(
            cur, text_col=text_col, id_col=id_col
        ).select(id_col)
        cur = count_drop("exact_dedup", cur.join(reps, id_col, "left_semi"))
        pairs = _dedup.minhash_lsh_pairs(
            cur,
            threshold=config.minhash_threshold,
            text_col=text_col,
            id_col=id_col,
        )
        cur = count_drop(
            "near_dedup",
            _dedup.lsh_dedup_representatives(pairs, cur, id_col=id_col),
        )
    if config.decontam_ngram is not None and test_sets is not None:
        cur = count_drop(
            "decontamination",
            _dedup.ngram_decontaminate(
                cur,
                test_sets,
                n=config.decontam_ngram,
                text_col=text_col,
                id_col=id_col,
            ),
        )
    if config.quality_model is not None:
        from cloudfabric_eventsourcing_spark.operators.classify import (
            score_quality,
        )

        scored = score_quality(cur, config.quality_model, text_col=text_col)
        cur = count_drop(
            "quality_classifier",
            scored.where(
                F.col("quality_prob") >= config.quality_floor
            ).select(id_col, text_col),
        )
    report["survivors"] = report.pop("__prev")
    return cur, report
