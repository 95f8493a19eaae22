"""SFT / instruction-tuning dataset templating — the engine face of the
reference's chat-dataset prep jobs.

Reference surface (what to compute):

- ``MachineLearning/Ray/zephyr/template_dataset.py:12-75`` builds a
  system/user/assistant chat list per row and renders the tokenizer's
  chat template into a single training string;
- ``NLP/llama2/src/prepare_dataset.py:11-60`` scrubs serial numbers,
  keeps top-quality rows, drops duplicate (input, output) pairs, renders
  ``<START_Q>…<END_Q><START_A>…<END_A>`` marker pairs, and takes a
  seeded 80/20 train/test split.

How it's computed here (Spark-first): template rendering is a pure
``concat`` of literal segments and columns — whole-stage-codegen
JVM string work, no tokenizer library, no UDF; the split is the
engine's deterministic md5-bucket ``hash_group_split`` (leakage-free,
engine-portable — the reference's ``train_test_split(seed=…)`` is
library-private RNG, which can't reproduce across engines); the token
budget reuses ``text.token_count``. Everything is map-side: the only
shuffle in :func:`sft_prepare` is the exact-dedup on the pair key, and
that is one hash aggregation — the same cost profile at 100 TB as the
reference's pandas ``drop_duplicates`` has at 1 GB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.setops import (
    hash_group_split,
)
from azuredataengineering_deeplearning_spark.operators.text import token_count

# Public chat formats, written as {sys}/{usr}/{asst} placeholder strings.
# zephyr: HuggingFaceH4 Zephyr-7B chat format (the template the
# reference's sft_instruct.py tokenizer applies); chatml: OpenAI ChatML;
# llama2: Meta's [INST] format; qa_markers: the reference's own
# <START_Q> convention (prepare_dataset.py:36-40, system text folded
# into the question block).
CHAT_TEMPLATES: dict[str, str] = {
    "zephyr": "<|system|>\n{sys}</s>\n<|user|>\n{usr}</s>\n<|assistant|>\n{asst}</s>",
    "chatml": (
        "<|im_start|>system\n{sys}<|im_end|>\n"
        "<|im_start|>user\n{usr}<|im_end|>\n"
        "<|im_start|>assistant\n{asst}<|im_end|>"
    ),
    "llama2": "<s>[INST] <<SYS>>\n{sys}\n<</SYS>>\n\n{usr} [/INST] {asst} </s>",
    "qa_markers": "<START_Q>{sys}{usr}<END_Q><START_A>{asst}<END_A>",
}

_SLOTS = ("{sys}", "{usr}", "{asst}")


def chat_messages(
    system: Column | str, user: Column | str, assistant: Column | str
) -> Column:
    """``array<struct<role,content>>`` chat list (template_dataset.py's
    ``chat_list`` rows, as a typed column — ``F.to_json`` it for JSONL
    sinks)."""

    def _c(x):
        return F.lit(x) if isinstance(x, str) else x

    return F.array(
        F.struct(F.lit("system").alias("role"), _c(system).alias("content")),
        F.struct(F.lit("user").alias("role"), _c(user).alias("content")),
        F.struct(F.lit("assistant").alias("role"), _c(assistant).alias("content")),
    )


def render_chat(
    template: str,
    system: Column | str,
    user: Column | str,
    assistant: Column | str,
) -> Column:
    """Render one chat turn through a template string with ``{sys}``,
    ``{usr}``, ``{asst}`` placeholders (or a :data:`CHAT_TEMPLATES`
    name). Compiles to one ``concat`` of literals and columns — pure
    JVM codegen, no UDF."""
    tpl = CHAT_TEMPLATES.get(template, template)
    cols = {"{sys}": system, "{usr}": user, "{asst}": assistant}
    parts: list[Column] = []
    buf = tpl
    while buf:
        hits = [(buf.find(s), s) for s in _SLOTS if buf.find(s) != -1]
        if not hits:
            parts.append(F.lit(buf))
            break
        idx, slot = min(hits)
        if idx:
            parts.append(F.lit(buf[:idx]))
        c = cols[slot]
        parts.append(F.lit(c) if isinstance(c, str) else c)
        buf = buf[idx + len(slot) :]
    return F.concat(*parts)


def sft_prepare(
    df: DataFrame,
    user_col: str,
    assistant_col: str,
    system: str = "",
    template: str = "zephyr",
    key: str | None = None,
    eval_frac: float = 0.2,
    max_tokens: int | None = None,
    out: str = "text",
) -> DataFrame:
    """The full prepare_dataset.py chain, distributed: drop null/empty
    pairs, exact-dedup on (user, assistant), render the chat template,
    token-budget filter, and attach a leakage-free ``split`` column
    (0=train, 1=eval) keyed on ``key`` (default: the user text, so
    duplicate questions can never straddle the split). One hash
    aggregation (the dedup) + map-side everything else."""
    u, a = F.col(user_col), F.col(assistant_col)
    clean = df.filter(
        u.isNotNull() & a.isNotNull() & (F.length(u) > 0) & (F.length(a) > 0)
    )
    # deterministic survivor per (user, assistant) pair — pandas
    # drop_duplicates keeps first encounter order, which is not
    # reproducible distributed; min over the remaining cols is.
    others = [c for c in clean.columns if c not in (user_col, assistant_col)]
    deduped = (
        clean.groupBy(user_col, assistant_col).agg(
            *[F.min(c).alias(c) for c in others]
        )
        if others
        else clean.distinct()
    )
    rendered = deduped.withColumn(
        out, render_chat(template, system, u, a)
    ).withColumn("n_tokens", token_count(F.col(out)))
    if max_tokens is not None:
        rendered = rendered.filter(F.col("n_tokens") <= max_tokens)
    split_key = key or user_col
    return hash_group_split(
        rendered, split_key, [1.0 - eval_frac, eval_frac], out="split"
    )
