"""Driver-contract pins for ``__spark_entry__`` (no Spark session needed).

The driver checks the FIRST 50 ``queries()`` entries for value-hash
correctness and tails 2 KB of bench stdout — both invariants have been
broken silently in past rounds by unrelated edits, so they are pinned
here structurally.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_window_is_exactly_fifty_unique_named_entries():
    w = entrymod._DRIVER_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50


def test_queries_lead_with_the_window_in_order():
    qs = entrymod.queries()
    assert list(qs)[:50] == entrymod._DRIVER_WINDOW


def test_window_is_sorted_by_exec_order_position():
    """The round-10 rotation's ONLY ordering invariant (r9 ADVICE: the
    old 'registration order within each cohort' comment claimed a
    property the list didn't maintain): the window is sorted by
    exec_order() position outright, which preserves every
    builder-before-consumer coupling the registry encodes."""
    pos = {n: i for i, n in enumerate(entrymod.exec_order())}
    idx = [pos[n] for n in entrymod._DRIVER_WINDOW]
    assert idx == sorted(idx)


def test_every_windowed_entry_has_an_oracle():
    # a windowed rows-only entry would silently downgrade a hard-signal
    # slot to a weak check; the single deliberate exception
    # (dedup_simhash_fast: xxhash64 has no DuckDB mirror) is named in
    # _ROWS_ONLY_WINDOWED and value-graded by dedup_simhash_fast_check
    oracles = entrymod.oracle_sql()
    missing = [
        n for n in entrymod._DRIVER_WINDOW
        if n not in oracles and n not in entrymod._ROWS_ONLY_WINDOWED
    ]
    assert not missing, missing
    assert entrymod._ROWS_ONLY_WINDOWED <= set(entrymod._DRIVER_WINDOW)
    assert not entrymod._ROWS_ONLY_WINDOWED & set(entrymod.oracle_sql())


def test_query_vec_ids_covers_every_literal_call_site():
    """Regression pin for the advisor-r8 AST warmup derivation (judge
    r9 item #4): bench's warmup primes exactly query_vec_ids(), so the
    derivation silently returning a subset would put first-touch fetch
    cost back inside timed rows.  Cross-check with an INDEPENDENT text
    scan: every integer literal in a ``_query_vec(...)`` call site must
    be in the derived set, and the loop-site ids (_RECALL_QIDS) too."""
    import inspect
    import re

    derived = set(entrymod.query_vec_ids())
    assert derived, "query_vec_ids() came back empty"
    assert set(entrymod._RECALL_QIDS) <= derived
    src = inspect.getsource(entrymod)
    literal = {
        int(n)
        for m in re.finditer(r"_query_vec\(([^()]*)\)", src, re.DOTALL)
        for n in re.findall(r"\b(\d+)\b", m.group(1))
    }
    assert literal <= derived, sorted(literal - derived)


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    orphaned = [n for n in entrymod.oracle_sql() if n not in qs]
    assert not orphaned, orphaned


# every (builder, consumer) pair whose artifact/memo the consumer
# serves from; pinned UNCONDITIONALLY on exec_order() — the order bench
# and the local gates actually execute in — so a reordering can never
# silently attribute a one-time build cost to a serving row (this
# mis-attribution shipped twice as a class: probe_stream and
# rebuild_search in round 6)
_BUILD_BEFORE_CONSUMER = [
    ("dedup_signature_index", "dedup_minhash_pairs"),
    ("dedup_signature_index", "dedup_clusters"),
    ("dedup_signature_index", "dedup_containment"),
    ("dedup_signature_index", "dedup_probe_batch"),
    ("dedup_signature_index", "dedup_probe_stream"),
    ("ann_ivf_index_build", "ann_ivf_partitioned"),
    ("rest_feed_source_agg", "feed_tail_stream"),
    ("kmeans_embeddings", "ann_ivf_kmeans_recall"),
    ("lsh_signature_index", "lsh_knn_cosine"),
    ("lsh_signature_index", "lsh_knn_multiprobe"),
    ("pq_codebook_build", "knn_pq"),
    ("rp_projection_index", "rp_knn_recall"),
    ("pq_codebook_build", "ann_ivfpq"),
    # lifecycle entries derive entry-private copies from shared
    # memoized bases — the base build must attribute to the
    # family's index-build row, not to the first mutation entry
    ("lsh_signature_index", "lsh_index_append_search"),
    ("lsh_signature_index", "lsh_index_delete_search"),
    ("lsh_signature_index", "lsh_index_compact_stats"),
    ("ann_ivf_index_build", "ann_ivf_delete_search"),
    ("ann_ivf_append_search", "ann_index_stream_append"),
    ("ann_ivf_index_build", "ann_ivf_append_search"),
    # rebuild derives from the APPENDED artifact (advisor r6 pin)
    ("ann_ivf_append_search", "ann_ivf_rebuild_search"),
    # merge derives from the shared base250 artifact, whose build cost
    # belongs to its first toucher (the append entry)
    ("ann_ivf_append_search", "ann_ivf_merge_search"),
    # the _STAGED_EVENTS default-key staging write (one-time events
    # copy for the file-stream source) must attribute to
    # events_hourly_stream, its designated first toucher (r8 item #2:
    # this staging cost was the entry's entire "drift" vs r1) — every
    # other default-key stager serves the memo
    ("events_hourly_stream", "stream_static_enrich"),
    ("events_hourly_stream", "stream_versioned_enrich"),
    ("events_hourly_stream", "session_window_stream"),
    ("events_hourly_stream", "user_distinct_stream"),
    ("events_hourly_stream", "stream_file_sink_roundtrip"),
    ("events_hourly_stream", "user_totals_stateful_stream"),
    ("events_hourly_stream", "value_histogram_stream"),
]


def test_build_entries_precede_their_consumers_in_exec_order():
    """Cost attribution: artifact builds must execute before the
    entries that serve from them, in the order bench/gates run."""
    order = entrymod.exec_order()
    pos = {n: i for i, n in enumerate(order)}
    for build, consumer in _BUILD_BEFORE_CONSUMER:
        assert build in pos and consumer in pos, (build, consumer)
        assert pos[build] < pos[consumer], (build, consumer)


def test_exec_order_is_a_permutation_of_queries():
    assert sorted(entrymod.exec_order()) == sorted(entrymod.queries())


# (entry, hazardous-callee) pairs whose flag is KNOWN BENIGN — each
# with the reason the cross-call cache hit cannot happen.  A new entry
# that reaches an operator-level persist must either land here with a
# written reason or go into _BUILD_ENTRIES; it can no longer ship
# silently (advisor r7: the old scan only read entrymod-level sources,
# which is exactly how the round-6 misses happened).
_PERSIST_EXONERATED = {
    # these dedup entries pass the SHARED sig_index (built and persisted
    # by dedup_signature_index, the bench-excluded family builder), so
    # the operator's internal shingle/signature persist branch is never
    # taken — the `if sig_index is not None:` guard routes around it
    ("dedup_minhash_pairs", "minhash_lsh_pairs"),
    ("dedup_clusters", "minhash_lsh_pairs"),
    ("dedup_containment", "containment_pairs"),
    ("dedup_ngram_jaccard", "ngram_jaccard_pairs"),
    # portable simhash passes sig_index the same way (the `and portable`
    # guard); only the portable=False pair persists per call (flagged
    # separately, in _BUILD_ENTRIES)
    ("dedup_simhash", "simhash_pairs"),
}


def _artifact_owning_entries() -> set[str]:
    """Mechanically derive which entries OWN a one-time build: every
    entry whose function (or any one-level operator-module callee)
    calls ``_memo_artifact``/``_derive_artifact`` or leaves a
    ``.persist()`` live past return, plus the FIRST entry in exec_order
    to touch each memo accessor (the ``*_path`` helpers, the
    persisted-DataFrame session memos, and the signatures-module corpus
    cache).  First-touchers pay the build; everyone after them serves
    the memo and may be re-timed.  The callee scan exists because
    CacheManager dedupes by PLAN EQUALITY: an operator that persists an
    internal DataFrame makes any identical re-invocation a cache hit,
    so a min-of-2 re-run of its entry would time the cache, not the
    work — regardless of which module the persist lives in."""
    import importlib
    import inspect
    import re

    MEMO_FNS = ("_memo_artifact", "_derive_artifact")
    MEMO_GLOBALS = (
        "_IVF_COARSE",
        "_PQ_ARTIFACTS",
        "_QUANTIZED_CORPUS",
        "_KMEANS_COARSE",
        "_EXACT_RECALL_BASELINE",
        # the streaming entries' staged file-source dir: first toucher
        # pays a full events write (the r7->r8 events_hourly_stream
        # "drift" was exactly this staging cost, profiled in BASELINE.md)
        "_STAGED_EVENTS",
        # the format-roundtrip entries' staged documents copies: every
        # user stages its OWN (sf_dir, fmt) key, so each is its own
        # build row (inline users are flagged directly; _stage_docs_as
        # helper users via the token's first-toucher plus manual
        # extras in _BUILD_ENTRIES)
        "_STAGED_FMT",
        # module-level dict memo in plans/tpch_extra: the bucketed
        # warehouse (lineitem+orders hash-bucketed on orderkey).  Its
        # accessor lives in plans/, not entrymod, so the one-level
        # callee scan is what reaches it — this name was the one
        # module-dict memo the scan didn't know (judge r8 item #1:
        # bucketed_join_revenue's bench row flipped 0.80->2.55 s on
        # pure attribution because the entry wasn't bench-excluded)
        "_BUCKETED_FACTS",
    )
    HARNESS = {
        "_registry", "queries", "exec_order", "oracle_sql", "entry",
        "reset_cached_memos", "_memo_artifact", "_derive_artifact",
    }

    def src_of(obj) -> str:
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):
            return ""

    def owns_build(s: str) -> bool:
        return any(
            re.search(re.escape(m) + r"\(", s) for m in MEMO_FNS
        ) or any(g in s for g in MEMO_GLOBALS)

    def leaky_persist(s: str) -> bool:
        # a persist with no unpersist in the same function stays live
        # past return -> identical re-invocations are cache hits
        return ".persist()" in s and ".unpersist()" not in s

    def callees(fn) -> dict[str, object]:
        """One level of package-internal callees: names called in the
        source, resolved through the defining module's globals plus any
        ``from inmem_vector_db_spark.* import ...`` in the body."""
        s = src_of(fn)
        mod = inspect.getmodule(fn)
        scope: dict[str, object] = dict(vars(mod)) if mod else {}
        for m in re.finditer(
            r"from\s+(inmem_vector_db_spark[.\w]*)\s+import\s+([\w,\s]+)", s
        ):
            try:
                imported = importlib.import_module(m.group(1))
            except ImportError:
                continue
            for nm in m.group(2).replace(",", " ").split():
                if hasattr(imported, nm):
                    scope[nm] = getattr(imported, nm)
        out = {}
        for nm in set(re.findall(r"\b([A-Za-z_]\w*)\(", s)):
            obj = scope.get(nm)
            if inspect.isfunction(obj) and getattr(
                obj, "__module__", ""
            ).startswith("inmem_vector_db_spark"):
                out[nm] = obj
        return out

    tokens = {
        name
        for name, obj in vars(entrymod).items()
        if inspect.isfunction(obj)
        and name not in HARNESS
        and owns_build(src_of(obj))
    }
    tokens.add("corpus_signature_index")  # operators.signatures._CACHE

    reg = entrymod._registry()
    first_toucher: dict[str, str] = {}
    owners: set[str] = set()
    for name in entrymod.exec_order():
        s = src_of(reg[name])
        if owns_build(s) or leaky_persist(s):
            owners.add(name)
        # simhash_pairs(portable=False) persists its signature table
        # internally and CacheManager dedupes identical plans across
        # calls, so any entry on that path is re-run-hazardous too
        if "portable=False" in s:
            owners.add(name)
        # one level down: operator-module callees that memo or persist.
        # Callees that ARE memo accessors (tokens) stay under
        # first-toucher semantics — every non-first toucher serves the
        # memo on first AND second call, so its re-run is fair.
        for cname, cfn in callees(reg[name]).items():
            if cname in tokens:
                continue
            cs = src_of(cfn)
            if (owns_build(cs) or leaky_persist(cs)) and (
                name, cname,
            ) not in _PERSIST_EXONERATED:
                owners.add(name)
        for t in tokens:
            if re.search(r"\b" + re.escape(t) + r"\(", s):
                first_toucher.setdefault(t, name)
    return owners | set(first_toucher.values())


def test_artifact_owning_entries_are_bench_excluded():
    """bench.py's min-of-2 re-run must skip every entry whose first
    call pays a one-time memoized build (re-timing the memo hit would
    falsify the build cost the row exists to attribute — shipped twice
    as a bug class in round 6: probe_stream, rebuild_search).
    _BUILD_ENTRIES may hold manual extras (entries that stage their own
    artifacts outside the memo helpers) but can never miss an owner."""
    need = _artifact_owning_entries()
    missing = sorted(need - entrymod._BUILD_ENTRIES)
    assert not missing, f"artifact owners not bench-excluded: {missing}"
    unknown = sorted(entrymod._BUILD_ENTRIES - set(entrymod.queries()))
    assert not unknown, f"_BUILD_ENTRIES names not in queries(): {unknown}"
