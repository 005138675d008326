"""L1-L4 lexicon resolvers (SimpleResolver / SimpleLetterResolver /
SimpleNumericResolver, SURVEY.md §2.6).

``compare_words`` reproduces SimpleResolver.compareWords
(SimpleResolver.java:51-119) decisions exactly, but as a banded dynamic
program instead of the reference's exponential recursion: both compute
"minimum edit distance <= budget", since along any optimal alignment the
running error count is monotone, so no optimal path is lost to the
reference's budget pruning. Semantics preserved verbatim:

  * optional case folding (lowercase both)
  * a '\\r' in the template matches any character (consuming both)
  * a trailing '^' on the template = prefix match: once the template is
    consumed, remaining compare characters are free
  * otherwise the leftover length difference counts as errors

Validated case-by-case against tests/goldens/words_golden.json (dumped from
the compiled reference).
"""

from __future__ import annotations

import numpy as np


def compare_words(template: str, compare: str, max_errors: int, case_sensitive: bool) -> bool:
    if not case_sensitive:
        template = template.lower()
        compare = compare.lower()
    trim_compare = template.endswith("^")
    if trim_compare:
        template = template[:-1]

    nt, nc = len(template), len(compare)
    INF = max_errors + 1  # costs are capped; anything above the budget rejects

    # dp[j] = min errors aligning template[:i] with compare[:j]
    dp = np.arange(nc + 1, dtype=np.int64)  # i = 0: delete all of compare prefix
    dp = np.minimum(dp, INF)
    for i in range(1, nt + 1):
        t = template[i - 1]
        prev = dp
        dp = np.full(nc + 1, INF, dtype=np.int64)
        dp[0] = min(i, INF)  # template prefix unmatched
        for j in range(1, nc + 1):
            sub = prev[j - 1] + (0 if (t == "\r" or t == compare[j - 1]) else 1)
            dp[j] = min(sub, prev[j] + 1, dp[j - 1] + 1, INF)

    if trim_compare:
        # template consumed; any remaining compare suffix is free
        dist = int(dp.min())
    else:
        dist = int(dp[nc])
    return dist <= max_errors


class WordResolver:
    """L1: SimpleResolver.acceptWord (:30-48) — accept a recognized word iff
    it fuzzy-matches any template word; accept-all when no list configured."""

    def __init__(self, max_errors: int = 0, words: list[str] | None = None,
                 case_sensitive: bool = False):
        self.max_errors = max_errors
        self.words = list(words or [])
        self.case_sensitive = case_sensitive

    def accept_word(self, word: str) -> bool:
        if not self.words:
            return True
        return any(
            compare_words(w, word, self.max_errors, self.case_sensitive) for w in self.words
        )


def char_class_mask(alphabet_chars: list[str], allowed: str) -> np.ndarray:
    """L3/L4 alphabet subsetting: boolean accept mask over the learned
    alphabet for classify_batch(accept=...). Unlike the reference's
    acceptSymbol hook — whose rejected symbols keep distance 0 and win the
    argmin anyway (CurvatureClassifier.java:989-1017, a latent bug) — the
    mask excludes rejected symbols from the distance minimum entirely, which
    is the reference's evident intent (SimpleLetterResolver.java:17-44)."""
    allowed_set = set(allowed)
    return np.array([c in allowed_set for c in alphabet_chars], dtype=bool)


DIGITS = "0123456789"
LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def numeric_mask(alphabet_chars: list[str]) -> np.ndarray:
    """L4: SimpleNumericResolver (digits-only alphabet)."""
    return char_class_mask(alphabet_chars, DIGITS)


def letter_mask(alphabet_chars: list[str]) -> np.ndarray:
    """L3: SimpleLetterResolver (letters-only alphabet)."""
    return char_class_mask(alphabet_chars, LETTERS)
