"""Python UDTF surface (Spark 4): row-expanding table functions.

Most row expansion belongs in built-in generators (explode/posexplode
— see chunking), but UDTFs are the escape hatch when the expansion
logic is genuinely imperative. ``SentenceSplit`` keeps the example
honest-but-simple: regex sentence segmentation with per-sentence
positions, the shape a curation pipeline uses to split documents
before sentence-level filtering/dedup.

Scale shape: a UDTF is a narrow per-row transform — no shuffle, plain
partition parallelism, Arrow-batched in Spark 4 — so it scales exactly
like the expression path, minus Python worker throughput. Anything
expressible with explode should still use explode (the oracle query
for this operator IS the explode/unnest twin, proving equivalence).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[^.!?]+[.!?]?")


@udtf(returnType="sent_idx int, sentence string, n_words int")
class SentenceSplit:
    """One output row per non-empty sentence of the input text."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        idx = 0
        for m in _SENT_RE.finditer(text):
            s = m.group(0).strip()
            if not s:
                continue
            yield idx, s, len(s.split())
            idx += 1
