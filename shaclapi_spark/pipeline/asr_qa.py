"""Transcript-quality (ASR-QA) report operators: character error rate and
token (word) error rate between each transcript row and its clip's inline
reference transcript.

The reference engine's per-row invariant is EXACT transcript equality
(BASELINE input_hint; the fk_match constraint kind, suite.py). Real audio
pipelines also need the graded version — "how far off is this transcript?"
— both as a report (this module) and as a tolerance constraint
(engine.py's ``fk_near_match`` kind). Provenance: the reference validates
only exact equality (/root/reference/tests/test_main.py asserts exact
valid/invalid entity sets); edit-distance grading is an engine-original
addition mandated by the graft brief's training-data-pipeline ops.

Scale shape (100 TB):
* both metrics are 100% JVM built-ins — ``levenshtein``, ``split``,
  ``transform``/``array_join`` — no Python in the hot path, no UDF;
* the only shuffle is the clip_id equi-join (bucketed layouts co-locate
  it, see bucketing.py); the join carries the two text columns once and
  all derived metrics are row-local projections after it;
* WER needs a token-level edit distance, which Spark lacks. Instead of a
  pandas-UDF DP we REDUCE it to the built-in char-level ``levenshtein``:
  per pair, build the distinct-token vocabulary of the two strings
  (``array_distinct``), injectively encode every token as ONE single-byte
  ASCII character (``substring`` into a 92-char alphabet indexed by
  ``array_position``), and run ``levenshtein`` on the encoded strings.
  Token-level and encoded-char-level distances are identical because the
  encoding is a per-pair bijection between tokens and characters. Pairs
  whose combined vocabulary exceeds the alphabet (92 distinct tokens)
  get ``NULL`` metrics and ``vocab_overflow=true`` — deterministic and
  visible, never silently wrong.

Cross-engine exactness: DuckDB's ``levenshtein`` is BYTE-level while
Spark's is codepoint-level, so the value-hash oracle equivalence holds
for ASCII text (the fixture's transcripts are ASCII; a unit test pins
the non-ASCII divergence so it cannot surprise anyone). Error *rates*
are reported as exact integer ppm (``1e6 * dist DIV ref_len``) — no
float division anywhere, so hashes match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 92 printable ASCII chars, excluding ' and \ so the same literal pastes
# into ANSI SQL (DuckDB oracle) without escaping surprises.
ALPHABET = "".join(chr(c) for c in range(33, 127) if chr(c) not in "'\\")


def _idiv(num: Column, den: Column) -> Column:
    """Exact integer division (SQL ``div``) — no float path, so oracle
    value-hashes match DuckDB's ``//`` bit-for-bit."""
    return F.call_function("div", num, den)


def _tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (split-on-space keeps ''
    for runs of spaces; both engines agree after the filter)."""
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def _encode(token_list: Column, vocab: Column) -> Column:
    """Injective token→ASCII-char encoding (see module docstring)."""
    return F.array_join(
        F.transform(
            token_list,
            lambda t: F.substring(
                F.lit(ALPHABET), F.array_position(vocab, t).cast("int"), 1
            ),
        ),
        "",
    )


def pair_cer(
    clips: DataFrame,
    transcripts: DataFrame,
    clip_id: str = "clip_id",
    ref_col: str = "transcript",
    hyp_col: str = "text",
) -> DataFrame:
    """Character edit distance + CER per (transcript row, owning clip).

    Returns (transcript_id, clip_id, edit_dist, ref_chars, hyp_chars,
    cer_ppm): ``edit_dist`` is the exact Levenshtein distance between the
    clip's inline reference transcript and the transcript row's text;
    ``cer_ppm = 1e6 * edit_dist DIV ref_chars`` (integer, exact; NULL for
    an empty reference). Pairs where either side is NULL are dropped —
    missing-ness is not_null's / fk_exists's job, not a distance.

    Duplicate parent keys (the fixture seeds conflicting duplicate clips)
    produce one report row per (transcript, clip-row) pair — this is a
    report of observed pairs, not a verdict; the verdict form is the
    engine's ``fk_near_match`` constraint.
    """
    ref = clips.select(
        F.col(clip_id).alias("__cid"), F.col(ref_col).alias("__ref")
    ).filter(F.col("__ref").isNotNull())
    hyp = transcripts.select(
        "transcript_id", F.col(clip_id), F.col(hyp_col).alias("__hyp")
    ).filter(F.col("__hyp").isNotNull() & F.col(clip_id).isNotNull())
    j = hyp.join(ref, hyp[clip_id] == ref["__cid"], "inner")
    dist = F.when(F.col("__ref") == F.col("__hyp"), F.lit(0)).otherwise(
        F.levenshtein("__ref", "__hyp")
    )
    return j.select(
        "transcript_id",
        F.col(clip_id),
        dist.alias("edit_dist"),
        F.length("__ref").alias("ref_chars"),
        F.length("__hyp").alias("hyp_chars"),
        F.when(
            F.length("__ref") > 0,
            _idiv((F.lit(1_000_000) * dist).cast("long"), F.length("__ref")),
        ).alias("cer_ppm"),
    )


def pair_wer(
    clips: DataFrame,
    transcripts: DataFrame,
    clip_id: str = "clip_id",
    ref_col: str = "transcript",
    hyp_col: str = "text",
) -> DataFrame:
    """Token (word) edit distance + WER per (transcript row, owning clip),
    via the per-pair token→char encoding reduction (module docstring).

    Returns (transcript_id, clip_id, token_dist, ref_tokens, hyp_tokens,
    wer_ppm, vocab_overflow). ``wer_ppm = 1e6 * token_dist DIV
    ref_tokens`` (integer; NULL when the reference has no tokens).
    ``vocab_overflow`` pairs (> 92 distinct tokens across both sides)
    report NULL distances.
    """
    ref = clips.select(
        F.col(clip_id).alias("__cid"), F.col(ref_col).alias("__ref")
    ).filter(F.col("__ref").isNotNull())
    hyp = transcripts.select(
        "transcript_id", F.col(clip_id), F.col(hyp_col).alias("__hyp")
    ).filter(F.col("__hyp").isNotNull() & F.col(clip_id).isNotNull())
    j = hyp.join(ref, hyp[clip_id] == ref["__cid"], "inner")
    ta, tb = _tokens(F.col("__ref")), _tokens(F.col("__hyp"))
    j = j.select(
        "transcript_id",
        F.col(clip_id),
        ta.alias("__ta"),
        tb.alias("__tb"),
        F.array_distinct(F.concat(ta, tb)).alias("__vocab"),
    )
    overflow = F.size("__vocab") > len(ALPHABET)
    dist = F.when(overflow, F.lit(None).cast("int")).otherwise(
        F.levenshtein(
            _encode(F.col("__ta"), F.col("__vocab")),
            _encode(F.col("__tb"), F.col("__vocab")),
        )
    )
    return j.select(
        "transcript_id",
        F.col(clip_id),
        dist.alias("token_dist"),
        F.size("__ta").alias("ref_tokens"),
        F.size("__tb").alias("hyp_tokens"),
        F.when(
            (F.size("__ta") > 0) & ~overflow,
            _idiv((F.lit(1_000_000) * dist).cast("long"), F.size("__ta")),
        ).alias("wer_ppm"),
        overflow.alias("vocab_overflow"),
    )
