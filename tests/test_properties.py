"""Property-based tests (SURVEY.md §5.4): random inputs against independent
reference implementations / invariants."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from conftest import REPO  # noqa: F401


def _levenshtein(a: str, b: str) -> int:
    """Trusted textbook implementation with the resolver's '\\r' wildcard."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cost = 0 if (ca == "\r" or ca == cb) else 1
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + cost))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcXY", max_size=10),
    st.text(alphabet="abcXY", max_size=10),
    st.integers(min_value=0, max_value=6),
    st.booleans(),
)
def test_compare_words_equals_levenshtein(template, compare, budget, case_sensitive):
    from ocr_spark.kernel.resolver import compare_words

    t = template.lower() if not case_sensitive else template
    c = compare.lower() if not case_sensitive else compare
    expected = _levenshtein(t, c) <= budget
    assert compare_words(template, compare, budget, case_sensitive) == expected


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcd", max_size=8),
    st.text(alphabet="abcd", min_size=0, max_size=6),
    st.integers(min_value=0, max_value=4),
)
def test_compare_words_prefix_mode(template, suffix, budget):
    """'template^' accepts any compare whose some prefix is within budget."""
    from ocr_spark.kernel.resolver import compare_words

    # exact template + arbitrary suffix must always match in prefix mode
    assert compare_words(template + "^", template + suffix, budget, True)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_contour_sentinels_on_random_matrices(seed):
    """F2 invariants on random glyph matrices: empty rows/cols produce the
    documented sentinels; values otherwise stay within [0, N]."""
    from ocr_spark.kernel.features import extract_contour

    rng = np.random.default_rng(seed)
    m = rng.random((9, 9)) < 0.3
    cont = extract_contour(m.astype(bool))
    assert cont.shape == (8, 9)
    assert np.isfinite(cont[~np.isnan(cont)]).all()
    # forward scans that find no ink accumulate ~N, reverse ~-1; everything
    # else is a bin-averaged first-ink distance in [-1, 9]
    valid = cont[~np.isnan(cont)]
    assert ((valid >= -1.0001) & (valid <= 9.0001)).all()


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_curvature_vector_deterministic_and_bounded(seed):
    """F5: rerunning the kernel on the same matrix is bit-identical and the
    zone areas are bounded by the matrix area."""
    from ocr_spark.kernel.features import curvature_vector

    rng = np.random.default_rng(seed)
    m = rng.random((9, 9)) < 0.35
    v1 = curvature_vector(m)
    v2 = curvature_vector(m)
    assert np.array_equal(v1, v2)
    assert (v1 >= 0).all() and (v1 <= 81).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_strip_html_idempotent_on_plain_text(seed):
    """Stripping already-stripped text is a fixpoint (no tags left)."""
    import pandas as pd

    from ocr_spark.html.strip import strip_html

    rng = np.random.default_rng(seed)
    words = ["".join(rng.choice(list("abcdef"), size=4)) for _ in range(6)]
    text = " ".join(words)
    once = strip_html(pd.Series([f"<p>{text}</p>"]))[0]
    twice = strip_html(pd.Series([once]))[0]
    assert once == text
    assert twice == once


def test_strip_html_nested_same_tag_containers():
    """Nested same-tag boilerplate must be removed whole: with a lazy
    open-to-first-close match, the tail of the outer container (here the
    'leaked menu tail items' list) would survive into block scoring."""
    import pandas as pd

    from ocr_spark.html.strip import strip_html

    html = (
        "<html><body>"
        "<nav>outer menu start <nav>inner menu items here</nav>"
        "<p>leaked menu tail items would score as content</p></nav>"
        "<p>the actual main content sentence</p>"
        "<footer>a<footer>b</footer>c</footer>"
        "</body></html>"
    )
    out = strip_html(pd.Series([html]))[0]
    assert out == "the actual main content sentence"

    # triple nesting converges too (fixpoint, not a fixed pass count)
    deep = "<nav>a<nav>b<nav>c</nav>d</nav><p>nav tail junk here</p></nav><p>keep this main text</p>"
    assert strip_html(pd.Series([deep]))[0] == "keep this main text"


def test_strip_html_deep_nesting_never_leaks():
    """The fixpoint loop must run to convergence, not a fixed pass count:
    an 11-deep same-tag nest leaked its boilerplate under the old 10-pass
    cap. Past the (generous) pass cap, the residual sweep must DROP the
    unconverged subtree wholesale rather than leak its text."""
    import pandas as pd

    from ocr_spark.html.strip import strip_html

    def nest(depth):
        return (
            "<nav>" * depth
            + "menu junk boilerplate words"
            + "</nav>" * depth
            + "<p>kept main content sentence</p>"
        )

    # 11-deep: converges (beyond the old cap of 10)
    assert strip_html(pd.Series([nest(11)]))[0] == "kept main content sentence"
    # 300-deep: beyond _MAX_FIXPOINT_PASSES — residual sweep drops the
    # whole subtree; the boilerplate text must not appear in the output
    out = strip_html(pd.Series([nest(300)]))[0]
    assert out == "kept main content sentence"


def test_strip_html_output_independent_of_batch_neighbors():
    """Span-sequence equality is per document: a doc's stripped output must
    not depend on which other rows share its Arrow batch. A converged row
    with a dangling container opener must NOT be hit by the residual sweep
    that an unconverged co-batched row (300-deep nest exhausting the pass
    cap) triggers."""
    import pandas as pd

    from ocr_spark.html.strip import strip_html

    victim = (
        "<p>intro words here</p> </nav> <p><nav> trailing real content "
        "sentence with many words kept</p>"
    )
    deep = (
        "<nav>" * 300 + "menu junk boilerplate words" + "</nav>" * 300
        + "<p>deep doc content sentence kept</p>"
    )
    alone = strip_html(pd.Series([victim]))[0]
    together = strip_html(pd.Series([victim, deep]))
    assert together[0] == alone
    assert together[1] == "deep doc content sentence kept"


def test_strip_html_unclosed_container_degrades_like_lazy():
    """Malformed (unbalanced) HTML: an unclosed outer <nav> whose only close
    tag belongs to an inner nav must still drop its boilerplate up to that
    close (first-open-to-first-close), not leak it into content."""
    import pandas as pd

    from ocr_spark.html.strip import strip_html

    html = (
        "<nav>home about pricing contact menu <nav>sub items</nav>"
        "<p>real main content sentence here</p>"
    )
    assert strip_html(pd.Series([html]))[0] == "real main content sentence here"

    # a batch mixing balanced and unbalanced rows routes each correctly
    batch = pd.Series([
        html,
        "<nav>a<nav>b</nav>c</nav><p>balanced row main text</p>",
    ])
    out = strip_html(batch)
    assert out[0] == "real main content sentence here"
    assert out[1] == "balanced row main text"


def test_winnowing_guarantee():
    """Any shared run of k+w-1 tokens yields at least one shared fingerprint
    (the winnowing guarantee), checked kernel-side with pandas semantics."""
    import hashlib

    k, w = 3, 4

    def winnow(tokens):
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
        hs = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
        return {min(hs[max(0, i - w + 1) : i + 1]) for i in range(w - 1, len(hs))}

    rng = np.random.default_rng(11)
    vocab = ["t%d" % i for i in range(50)]
    shared = [str(v) for v in rng.choice(vocab, size=k + w - 1)]
    a = [str(v) for v in rng.choice(vocab, size=10)] + shared
    b = shared + [str(v) for v in rng.choice(vocab, size=10)]
    assert winnow(a) & winnow(b)
