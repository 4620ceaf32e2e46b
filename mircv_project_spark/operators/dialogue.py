"""Dialogue training-data preparation over the transcript table.

Two shapes every chat-model pipeline needs between "raw transcripts"
and "packed token sequences" (operators/pipeline.pack_sequences):

- ``turn_windows``: sliding windows of W consecutive turns per
  conversation, concatenated — the context-window sampling that turns
  long conversations into bounded training examples;
- ``assistant_token_spans``: per turn, its [start, end) token offsets
  within the conversation's concatenated token stream plus the
  is_target flag — the loss-mask computation (train on assistant
  tokens only), done as exact integer prefix sums so it is
  shuffle-order-independent.

Pins (restated in the oracle — change both or neither):
- turn order within a conversation is turn_idx asc; windows require
  CONTIGUOUS turn_idx (lead(turn_idx, j) == turn_idx + j — restated,
  not assumed, even though the synthetic corpus is always contiguous);
- window text = concat_ws('\\n', texts) — BOTH engines' concat_ws
  skips NULL elements (a NULL middle turn shortens the window text,
  it does not null it);
- token counts = T1-T5 tokens (functions/textnorm.tokens_col), NULL
  text counts 0 (coalesce BEFORE the running sum);
- spans: start = running sum of preceding turns' counts (window sum
  ROWS UNBOUNDED PRECEDING minus own), is_target = role = 'assistant'.

Scale shape: both are one conv_id-keyed window pass — map-only under a
conv-bucketed layout; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col

WINDOW_TURNS = 3


def turn_windows(transcripts: DataFrame, w: int = WINDOW_TURNS) -> DataFrame:
    """-> (conv_id, start_turn, text): every window of w contiguous
    turns, text = concat_ws('\\n', turn texts)."""
    win = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc())
    cols = [F.col("text").alias("t0")]
    contig = None
    for j in range(1, w):
        cols.append(F.lead("text", j).over(win).alias(f"t{j}"))
        cond = F.lead("turn_idx", j).over(win) == F.col("turn_idx") + j
        contig = cond if contig is None else (contig & cond)
    # window expressions must be projected before they can be filtered
    staged = (
        transcripts.select(
            "conv_id",
            F.col("turn_idx").alias("start_turn"),
            *cols,
            contig.alias("_contig"),
        )
        .where(F.col("_contig"))
    )
    return staged.select(
        "conv_id",
        "start_turn",
        F.concat_ws("\n", *[F.col(f"t{j}") for j in range(w)]).alias("text"),
    )


def assistant_token_spans(transcripts: DataFrame) -> DataFrame:
    """-> (conv_id, turn_idx, start_tok, end_tok, is_target): token
    offsets of each turn within its conversation's concatenated token
    stream, and whether the turn's tokens are loss targets."""
    win = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per = transcripts.select(
        "conv_id",
        "turn_idx",
        F.coalesce(F.size(tokens_col(F.col("text"))), F.lit(0))
        .cast("long")
        .alias("ntok"),
        (F.col("role") == "assistant").alias("is_target"),
    )
    return per.select(
        "conv_id",
        "turn_idx",
        (F.sum("ntok").over(win) - F.col("ntok")).cast("long").alias("start_tok"),
        F.sum("ntok").over(win).cast("long").alias("end_tok"),
        "is_target",
    )


def instruction_pairs(transcripts: DataFrame) -> DataFrame:
    """-> (conv_id, turn_idx, prompt, response, prompt_ntok,
    response_ntok): SFT instruction/response pair extraction — every
    assistant turn paired with the IMMEDIATELY preceding user turn of
    its conversation (the canonical supervised-fine-tuning example
    miner over a chat corpus).

    Pinned semantics (restated in oracle._INSTRUCTION_PAIRS_SQL via
    the documents->transcripts id law — change both sides or
    neither): STRICT adjacency (prev turn_idx == turn_idx - 1 in the
    SAME conversation) AND prev role == 'user' — an assistant turn
    following a tool/system turn emits nothing; turn_idx = the
    ASSISTANT turn's index; token counts = the T1-T5 token pipeline
    (textnorm.tokens_col), NULL text counts 0.

    Scale shape (100 TB): ONE self-equi-join on (conv_id, turn_idx-1)
    — co-located under a conv-bucketed layout, never a window over
    full conversations."""
    a = transcripts.where(F.col("role") == "assistant").select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("text").alias("response"),
    )
    u = transcripts.where(F.col("role") == "user").select(
        "conv_id",
        (F.col("turn_idx").cast("int") + F.lit(1)).alias("turn_idx"),
        F.col("text").alias("prompt"),
    )
    ntok = lambda c: F.coalesce(  # noqa: E731 — tiny local shorthand
        F.size(tokens_col(F.col(c))), F.lit(0)
    ).cast("long")
    return a.join(u, ["conv_id", "turn_idx"]).select(
        "conv_id",
        "turn_idx",
        "prompt",
        "response",
        ntok("prompt").alias("prompt_ntok"),
        ntok("response").alias("response_ntok"),
    )


def preference_pairs(transcripts: DataFrame) -> DataFrame:
    """-> (conv_id, chosen_turn, rejected_turn, chosen_quality,
    rejected_quality, margin_micro): conversation-level best-of-n
    response selection — among each conversation's ASSISTANT turns,
    chosen = the highest-quality response, rejected = the lowest
    (the DPO / RLHF preference-pair miner over a chat corpus: when a
    conversation carries multiple candidate responses, train on the
    best-vs-worst contrast).

    Pinned semantics (restated in oracle._PREFERENCE_PAIRS_SQL —
    change both sides or neither): quality = textstats.quality_expr,
    the ONE shared round-6 formula; chosen = first under (quality
    desc, turn_idx asc), rejected = first under (quality asc, turn_idx
    DESC) — with all-equal qualities the pair is (earliest, latest),
    never degenerate; only conversations with >= 2 assistant turns
    emit; margin_micro = CAST(round((chosen_q - rejected_q) * 1e6) AS
    BIGINT) (the integer contrast the downstream sampler ranks on).

    Scale shape (100 TB): one tokenize pass over assistant turns, two
    row_number windows + one count over (conv_id) — co-located under a
    conv-bucketed layout, no joins beyond the 1:1 chosen/rejected
    stitch."""
    from ..functions.textnorm import tokens_col
    from .textstats import quality_expr

    a = (
        transcripts.where(F.col("role") == "assistant")
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            tokens_col(F.col("text")).alias("toks"),
        )
        .withColumn("q", quality_expr(F.col("toks")))
        .drop("toks")
    )
    wc = Window.partitionBy("conv_id").orderBy(
        F.col("q").desc(), F.col("turn_idx").asc()
    )
    wr = Window.partitionBy("conv_id").orderBy(
        F.col("q").asc(), F.col("turn_idx").desc()
    )
    wn = Window.partitionBy("conv_id")
    ranked = (
        a.withColumn("rc", F.row_number().over(wc))
        .withColumn("rr", F.row_number().over(wr))
        .withColumn("na", F.count("*").over(wn))
        .where(F.col("na") >= 2)
    )
    chosen = ranked.where(F.col("rc") == 1).select(
        "conv_id",
        F.col("turn_idx").alias("chosen_turn"),
        F.col("q").alias("chosen_quality"),
    )
    rejected = ranked.where(F.col("rr") == 1).select(
        "conv_id",
        F.col("turn_idx").alias("rejected_turn"),
        F.col("q").alias("rejected_quality"),
    )
    return chosen.join(rejected, "conv_id").select(
        "conv_id",
        "chosen_turn",
        "rejected_turn",
        "chosen_quality",
        "rejected_quality",
        F.round(
            (F.col("chosen_quality") - F.col("rejected_quality"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("margin_micro"),
    )
