"""Standing broadcast-hazard gate (judge r10 item #3).

``tools/broadcast_audit.py`` hunts the mid-scale AQE mis-broadcast
class at the synthetic decades — but it was manual (README-only), so a
regression re-introducing a corpus-derived broadcast side relied on a
human remembering to run it.  This test wires the SAME detector +
fingerprint triage into the suite at the suite SF, where the hazard is
*more* visible, not less: with the 64 MB adaptive threshold, AQE
broadcasts every corpus-derived aggregate that fits — which at
sf0.001 is ALL of them.  So if anyone replaces a ``shuffle_hash``-
pinned census join-back with a plain join (or drops the pin on
``semantic_dedup`` / ``decontam_overlap`` / ``corpus_pipeline_full``),
the corpus side gets broadcast right here and the triage fails the
suite.

The decade-scale run (real sizes, AQE fallback behavior) remains the
per-round certification step in README.md; this gate pins the plan
CLASS, cheaply, on every pytest run.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool_mod(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _audit_mod():
    return _tool_mod("broadcast_audit")


def _skew_mod():
    return _tool_mod("skew_probe")


# The census / canonical-pick / join-back family — every entry that has
# (or historically had) a corpus-derived joinable side.  Entries absent
# from _BENIGN must produce ZERO corpus-broadcast flags; entries in
# _BENIGN may only produce flags matching their recorded fingerprints.
GATED = [
    "tfidf_top_terms",
    "duplicated_spans",
    "bigram_lm_score",
    "crossdoc_shingle_dup",
    "boilerplate_ngrams",
    "top_ngrams",
    "corpus_curation",
    "corpus_pipeline_full",
    "decontam_overlap",
    "semantic_dedup",
    # r12 de-skewed stats entries: the label census broadcast must
    # match its recorded fingerprint; no hot-key window may return
    "embedding_norm_outliers",
    "ridge_conformal_intervals",
]


def test_no_unexplained_corpus_broadcasts_at_suite_sf(spark, sf_dir):
    """Both halves of the r10/r11 hazard class, on every pytest run:
    no corpus-derived broadcast side (the mis-broadcast half) AND no
    WindowExec partitioned by a corpus key (the hot-key-funnel half —
    a revert to the r10 window-count form has no broadcast to flag, so
    the broadcast check alone would wave it through; the plan shape is
    scale-independent, so the suite SF sees it just as well as the
    Zipf decade does)."""
    import __spark_entry__ as entrymod

    mod = _audit_mod()
    skew_mod = _skew_mod()
    qs = entrymod.queries()
    bad = {}
    # registry entries by name, plus the r12 percentile_approx
    # production twins (not registry entries — they take DataFrames,
    # so reuse skew_probe's loader-wrapping thunks)
    probees = [(n, qs[n]) for n in GATED] + list(skew_mod.TWINS)
    for name, fn in probees:
        df = fn(spark, sf_dir)
        df.collect()  # AQE finalizes the plan during execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        survivors = mod.triage(name, mod.corpus_broadcasts(plan))
        survivors += [
            "hot-key window: " + ln.strip()[:80]
            for ln in plan.splitlines()
            if skew_mod._HOT_WINDOW_KEY.search(ln)
        ]
        if survivors:
            bad[name] = survivors
    assert not bad, f"corpus-derived broadcast sides returned: {bad}"


def test_triage_rejects_unmatched_flag_for_allowlisted_entry():
    """Advisor r10: the allowlist must match individual flags, not
    blanket-exonerate an entry.  A fake hazardous subtree appearing
    under an allowlisted entry's name must survive triage as a
    failure."""
    mod = _audit_mod()
    hazardous = [(
        "BroadcastExchange HashedRelationBroadcastMode(...)",
        "+- HashAggregate(keys=[g#1], functions=[count(1)], output=[g#1, cb#2L])\n"
        "   +- Generate explode(...) documents.parquet",
    )]
    assert mod.triage("bigram_lm_score", hazardous) == [
        "BroadcastExchange HashedRelationBroadcastMode(...)"
    ]
    # the recorded benign shape still passes
    benign = [(
        "BroadcastExchange HashedRelationBroadcastMode(...)",
        "+- HashAggregate(keys=[w#1], functions=[count(1)], output=[w1#3, cu#2L])\n"
        "   +- Generate explode(...) documents.parquet",
    )]
    assert mod.triage("bigram_lm_score", benign) == []
    # and a non-allowlisted entry fails on any flag at all
    assert mod.triage("tfidf_top_terms", benign) != []


@pytest.mark.skipif(
    not os.path.isdir("/tmp/spark_graft_sf1_synth"),
    reason="decade synth not staged on this host",
)
def test_decade_audit_tool_importable_and_allowlist_well_formed():
    """Cheap structural pin for the decade tool itself: every _BENIGN
    entry carries a reason and at least one compilable fingerprint,
    and (r12) every allowlisted NAME resolves to a live registry entry
    or a probe twin — a renamed/deleted entry must not leave a stale
    exoneration behind that a future same-named entry would inherit."""
    import re

    import __spark_entry__ as entrymod

    mod = _audit_mod()
    live = set(entrymod.queries()) | {n for n, _ in _skew_mod().TWINS}
    for name, spec in mod._BENIGN.items():
        assert spec["reason"], name
        assert spec["expect"], name
        for p in spec["expect"]:
            re.compile(p)
        assert name in live, f"stale _BENIGN exoneration: {name}"


def test_hot_window_regex_contract():
    """Pin both directions of the r12 widened hot-window regex: it
    must match true PARTITION keys (corpus keys and the stats keys,
    composite or not, Window bracket-2 / WindowGroupLimit bracket-1 /
    windowspecdefinition forms) and must NOT match order/tie-break
    columns — including the GLOBAL-window rendering where the
    partition bracket is omitted and bracket 2 is the ORDER spec
    (the vocab_encode false-positive class)."""
    rx = _skew_mod()._HOT_WINDOW_KEY
    must_flag = [
        # plain corpus key, spec form
        "Window [count(1) windowspecdefinition(sh#3185, specifiedwindowframe(RowFrame, x, y)) AS n#1], [sh#3185], [..]",
        # stats key
        "Window [avg(value#1) windowspecdefinition(event_type#2, specifiedwindowframe(RowFrame, x, y)) AS mu#3], [event_type#2], [..]",
        # composite with the hot key NOT first (advisor r11)
        "Window [count(1) windowspecdefinition(src_id#9L, sh#10, specifiedwindowframe(RowFrame, x, y)) AS n#1], [src_id#9L, sh#10], [..]",
        # md5 expression as partition key (renamed-alias dodge)
        "Window [count(1) windowspecdefinition(md5(text#5), specifiedwindowframe(RowFrame, x, y)) AS n#1], [md5(text#5)], [..]",
        # WindowGroupLimit partition bracket
        "WindowGroupLimit [lang#7, source#8], [q#9 ASC NULLS FIRST], row_number(), 5, Final",
    ]
    must_pass = [
        # global window: bracket 2 IS the order spec (partition omitted)
        "Window [row_number() windowspecdefinition(c#9L DESC NULLS LAST, term#23 ASC NULLS FIRST, specifiedwindowframe(RowFrame, x, y)) AS r#16], [c#9L DESC NULLS LAST, term#23 ASC NULLS FIRST]",
        # per-doc window ordered by a corpus column (tie-break)
        "Window [row_number() windowspecdefinition(doc_id#1L, score#2 DESC NULLS LAST, term#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, x, y)) AS r#4], [doc_id#1L], [score#2 DESC NULLS LAST, term#3 ASC NULLS FIRST]",
        # lang# must not fire the single-letter g# alternative
        "Window [row_number() windowspecdefinition(doc_id#1L, slang#5 ASC NULLS FIRST, specifiedwindowframe(RowFrame, x, y)) AS r#4], [doc_id#1L], [slang#5 ASC NULLS FIRST]",
        # WindowGroupLimit partitioned by a unique key, ordered by a hot name
        "WindowGroupLimit [doc_id#1L], [lang#7 ASC NULLS FIRST], row_number(), 1, Partial",
    ]
    for ln in must_flag:
        assert rx.search(ln), f"regex went blind on: {ln}"
    for ln in must_pass:
        assert not rx.search(ln), f"false positive on: {ln}"
