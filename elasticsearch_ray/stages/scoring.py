"""Segment-local scorers: vectorized TAAT, block-max WAND, boolean RPN.

Score formulas are the reference's, applied in the same floating-point order
so results are score-identical (``selfindex_q_taat.py:173-182`` BM25/TF-IDF,
idf = ln((N+1)/(df+1)) from ``selfindex_q_taat.py:133``):

    bm25  = idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*(dl/avgdl)))
    tfidf = (tf/dl) * idf

Doc scores accumulate term-by-term in query order, exactly like the
reference's TAAT accumulator loop — so TAAT here, DAAT/WAND here, and the
oracle all produce bit-identical float sums.

Top-k tie-break is the engine-wide deterministic rule (-score, doc_id asc)
(SURVEY.md §2.6 K2).

* TAAT: one numpy accumulator over the segment's dense slot space; each
  term's postings scored in one vectorized expression.  This is the fast
  default: at web scale the per-posting work is pure SIMD.
* WAND (block-max): exact top-k with skipping — term upper bounds for pivot
  selection, per-128-block (max_tf, min_dl) upper bounds + lazy block decode
  so skipped blocks are never even decompressed.  Subsumes the reference's
  skip pointers (``selfindex_i1_skip_pointers.py:84-118``).
* boolean: RPN over sorted slot arrays (np intersect/union/setdiff), NOT
  against the segment-local doc universe (segments partition the doc space,
  so per-segment complement + cross-segment union is exact —
  SURVEY.md §7.4.6).
"""

from __future__ import annotations

import numpy as np

from ..state.segment import SegmentReader, scratch_pool as _scratch

# Slack for float-rounding in upper-bound pruning: a block is skipped only if
# its UB is below threshold by more than this relative epsilon.
_EPS = 1e-9


def _topk_by_score(slots: np.ndarray, scores: np.ndarray, k: int):
    """Exact top-k with (-score, slot asc) tie-break."""
    n = scores.size
    if n == 0 or k <= 0:  # size=0 is a legal count-only query
        return slots[:0], scores[:0]
    if n > 512 and n > k:
        thr = np.partition(scores, n - k)[n - k]
        mask = scores >= thr
        slots, scores = slots[mask], scores[mask]
    order = np.lexsort((slots, -scores))[:k]
    return slots[order], scores[order]


def term_scores(
    tfs: np.ndarray, dls: np.ndarray, idf: float, scoring: str, k1: float, b: float,
    avgdl: float,
) -> np.ndarray:
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    if scoring == "bm25":
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))
    return (tf / dl) * idf


def taat_candidates(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    scoring: str,
    k1: float,
    b: float,
    avgdl: float,
    min_should_match: int = 0,
):
    """Vectorized term-at-a-time over one segment; returns ALL candidate
    (slots, scores) — callers merge across segments and take ONE top-k
    (cheaper than a per-segment sort when a searcher holds many segments).

    ``min_should_match`` (ES minimum_should_match): keep only docs matching
    at least that many DISTINCT scoring query terms (terms with idf == 0 —
    df == N degenerates — neither score nor count, mirroring the oracle /
    SQL-twin convention).  One extra int32 accumulator, still no per-doc
    Python work."""
    acc = None
    nmatch = None
    seen: set[str] = set()
    touched: list[np.ndarray] = []
    for term in terms:
        idf = idfs.get(term, 0.0)
        if idf == 0.0:
            continue
        res = reader.postings_slots(term)
        if res is None:
            continue
        slots, tfs = res
        dls = reader.doc_lens[slots]
        s = term_scores(tfs, dls, idf, scoring, k1, b, avgdl)
        if acc is None:
            acc = np.zeros(reader.num_docs, dtype=np.float64)
        acc[slots] += s
        touched.append(slots)
        if min_should_match > 1 and term not in seen:
            seen.add(term)
            if nmatch is None:
                nmatch = np.zeros(reader.num_docs, dtype=np.int32)
            nmatch[slots] += 1
    if acc is None:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64)
    cand = np.unique(np.concatenate(touched))
    cand = cand[reader.doc_lens[cand] > 0]  # drop tombstoned (-1) docs
    if min_should_match > 1 and nmatch is not None:
        cand = cand[nmatch[cand] >= min_should_match]
    return cand, acc[cand]


def synonym_candidates(
    reader: SegmentReader,
    groups: list[list[str]],
    group_idfs: list[float],
    scoring: str,
    k1: float,
    b: float,
    avgdl: float,
):
    """Lucene ``SynonymQuery`` scoring over one segment (the query shape ES
    compiles a ``match`` query to under a ``synonym``/``synonym_graph``
    filter): each group of equivalent terms behaves as ONE pseudo-term —
    a doc's tf for the group is the SUM of its member tfs, summed BEFORE
    BM25's tf saturation (this is what distinguishes a synonym group from
    a plain OR of the members, whose saturations add), scored once with
    the group idf (df = max member df, Lucene's SynonymQuery weight).

    Groups then accumulate doc-by-doc exactly like TAAT terms, so a query
    whose groups are all singletons is score-identical to
    ``taat_candidates`` on the same terms.  Returns ALL candidate
    (slots, scores); callers merge across segments and take one top-k."""
    acc = None
    touched: list[np.ndarray] = []
    for g, idf in zip(groups, group_idfs):
        if idf == 0.0:  # df == 0 or df == N degenerates, same rule as TAAT
            continue
        tf_acc = None
        g_touch: list[np.ndarray] = []
        for t in dict.fromkeys(g):  # a member listed twice counts once
            res = reader.postings_slots(t)
            if res is None:
                continue
            slots, tfs = res
            if tf_acc is None:
                tf_acc = np.zeros(reader.num_docs, dtype=np.int64)
            tf_acc[slots] += tfs
            g_touch.append(slots)
        if tf_acc is None:
            continue
        gslots = np.unique(np.concatenate(g_touch))
        s = term_scores(
            tf_acc[gslots], reader.doc_lens[gslots], idf, scoring, k1, b,
            avgdl,
        )
        if acc is None:
            acc = np.zeros(reader.num_docs, dtype=np.float64)
        acc[gslots] += s
        touched.append(gslots)
    if acc is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = np.unique(np.concatenate(touched))
    cand = cand[reader.doc_lens[cand] > 0]  # drop tombstoned (-1) docs
    return cand, acc[cand]


def terms_set_candidates(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    scoring: str,
    k1: float,
    b: float,
    avgdl: float,
):
    """ES ``terms_set`` support over one segment: TAAT accumulation plus
    a per-doc DISTINCT-term match count.  Unlike ``taat_candidates``'s
    minimum_should_match (a fixed query-level threshold), terms_set
    compares the count against a PER-DOC required number, which only the
    caller (holding the doc-value column) can apply — so this returns
    (slots, scores, nmatch) and the caller filters.

    Counting rule matches the ES terms_set contract: duplicate terms in
    the query count once; terms absent from the whole index still count
    toward ``num_terms`` on the query side but can never match.  Unlike
    the msm path, zero-idf (df == N) terms DO count as matches here —
    ES's terms_set counts term OCCURRENCE, not scoring contribution —
    but contribute 0 to the BM25 sum (idf 0), keeping scores consistent
    with the ranked oracle."""
    acc = np.zeros(reader.num_docs, dtype=np.float64)
    nmatch = np.zeros(reader.num_docs, dtype=np.int32)
    touched: list[np.ndarray] = []
    for term in dict.fromkeys(terms):
        res = reader.postings_slots(term)
        if res is None:
            continue
        slots, tfs = res
        idf = idfs.get(term, 0.0)
        if idf != 0.0:
            dls = reader.doc_lens[slots]
            acc[slots] += term_scores(tfs, dls, idf, scoring, k1, b, avgdl)
        nmatch[slots] += 1
        touched.append(slots)
    if not touched:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                np.empty(0, dtype=np.int32))
    cand = np.unique(np.concatenate(touched))
    cand = cand[reader.doc_lens[cand] > 0]  # drop tombstoned (-1) docs
    return cand, acc[cand], nmatch[cand]


def taat_topk(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    k: int,
    scoring: str,
    k1: float,
    b: float,
    avgdl: float,
):
    """Vectorized term-at-a-time.  Returns (slots, scores, n_candidates)."""
    cand, scores = taat_candidates(reader, terms, idfs, scoring, k1, b, avgdl)
    top_slots, top_scores = _topk_by_score(cand, scores, k)
    return top_slots, top_scores, int(cand.size)


class _DaatCursor:
    __slots__ = ("qi", "idf", "slots", "tfs", "pos", "cur_doc")

    def __init__(self, qi, idf, slots, tfs):
        self.qi = qi
        self.idf = idf
        self.slots = slots
        self.tfs = tfs
        self.pos = 0
        self.cur_doc = int(slots[0]) if slots.size else _EXHAUSTED


def daat_topk(reader, terms, idfs, k, scoring, k1, b, avgdl):
    """True document-at-a-time cursor engine (reference Q2 semantics,
    ``selfindex_q_daat.py:177-252``): one cursor per query term; the minimum
    current slot across cursors is scored FULLY — all matching terms, query
    order, the reference's float accumulation order — before any cursor moves
    past it.  No skipping (that's WAND's job); exists as the WAND-off
    baseline and for engine parity.  Exact same top-k/scores as TAAT.

    Returns (top slots, top scores, n_docs_scored)."""
    import heapq

    cursors: list[_DaatCursor] = []
    for qi, t in enumerate(terms):
        idf = idfs.get(t, 0.0)
        if idf == 0.0:
            continue
        res = reader.postings_slots(t)
        if res is None or not res[0].size:
            continue
        cursors.append(_DaatCursor(qi, idf, res[0], res[1]))
    empty = np.empty(0, dtype=np.int64)
    if not cursors:
        return empty, np.empty(0, dtype=np.float64), 0

    dl_arr = reader.doc_lens
    heap: list[tuple[float, int]] = []  # (score, -slot) min-heap of size k
    n_scored = 0
    active = cursors  # already in query (qi) order; kept that way
    while active:
        pivot = min(c.cur_doc for c in active)
        dl = float(dl_arr[pivot])
        if dl > 0:  # dl <= 0 => tombstoned doc
            score = 0.0
            for c in active:
                if c.cur_doc == pivot:
                    tf = float(c.tfs[c.pos])
                    if scoring == "bm25":
                        score += c.idf * (tf * (k1 + 1)) / (
                            tf + k1 * (1 - b + b * (dl / avgdl))
                        )
                    else:
                        score += (tf / dl) * c.idf
            if score > 0:
                n_scored += 1
                item = (score, -pivot)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif heap and item > heap[0]:  # heap empty iff k <= 0
                    heapq.heapreplace(heap, item)
        nxt = []
        for c in active:
            if c.cur_doc == pivot:
                c.pos += 1
                if c.pos >= c.slots.size:
                    continue  # exhausted
                c.cur_doc = int(c.slots[c.pos])
            nxt.append(c)
        active = nxt

    if not heap:
        return empty, np.empty(0, dtype=np.float64), n_scored
    items = sorted(heap, key=lambda it: (-it[0], -it[1]))
    slots = np.array([-s for _, s in items], dtype=np.int64)
    scores = np.array([sc for sc, _ in items], dtype=np.float64)
    return slots, scores, n_scored


class _Cursor:
    """Per-term handle for the vectorized block-max evaluators: block
    metadata + upper bounds only (no decoded postings — blocks are decoded
    lazily by the evaluators themselves)."""

    __slots__ = ("qi", "row", "idf", "blk_last", "blk_ub", "nblocks", "df")

    def __init__(self, qi, row, idf, blk_last, blk_ub, df):
        self.qi = qi
        self.row = row
        self.idf = idf
        self.blk_last = blk_last
        self.blk_ub = blk_ub
        self.nblocks = blk_last.size
        self.df = df


_EXHAUSTED = np.iinfo(np.int64).max


def wand_topk(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    k: int,
    scoring: str,
    k1: float,
    b: float,
    avgdl: float,
    initial_threshold: float = 0.0,
):
    """Exact block-max WAND top-k BM25 (north_rule Q3).

    Returns (slots, scores, -1): total_hits is unknown by design — WAND's
    whole point is not visiting every candidate.
    """
    if k <= 0:  # the seed-threshold partitions below assume k >= 1
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), -1
    # zlib segments store whole-list cells (no per-block offsets): no lazy
    # block decode possible, so score fully vectorized — identical results
    if reader.codec == "zlib":
        s, sc, _ = taat_topk(reader, terms, idfs, k, scoring, k1, b, avgdl)
        return s, sc, -1

    cursors: list[_Cursor] = []
    for qi, t in enumerate(terms):
        idf = idfs.get(t, 0.0)
        if idf == 0.0:
            continue
        row = reader.term_row(t)
        if row is None:
            continue
        blk_last, blk_maxtf, blk_mindl = reader.block_meta_by_row(row)
        ub = term_scores(blk_maxtf, blk_mindl, idf, scoring, k1, b, avgdl)
        c = _Cursor(qi, row, idf, blk_last.astype(np.int64), ub, reader.df_by_row(row))
        cursors.append(c)
    if not cursors:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), -1

    # Hybrid exactness-preserving shortcuts (identical top-k):
    # small candidate sets are cheaper fully-vectorized than cursor-at-a-time
    if sum(c.df for c in cursors) <= 4096:
        s, sc, _ = taat_topk(reader, terms, idfs, k, scoring, k1, b, avgdl)
        return s, sc, -1
    # single term: block-at-a-time in descending upper-bound order — exact,
    # vectorized within blocks, stops when no block can beat the threshold
    if len(cursors) == 1:
        return _wand_single_term(reader, cursors[0], k, scoring, k1, b, avgdl,
                                 initial_threshold)
    # multi term: vectorized three-phase block-max evaluation (exact)
    return _wand_multi_blockmax(reader, cursors, k, scoring, k1, b, avgdl,
                                initial_threshold)


def _wand_multi_blockmax(reader, cursors, k, scoring, k1, b, avgdl,
                         initial_threshold):
    """Exact multi-term block-max evaluation, fully vectorized.

    Phase 1 (seed): decode the globally highest-upper-bound blocks and score
    them into an accumulator — partial sums are LOWER bounds on full doc
    scores, so the k-th best partial is a valid threshold.
    Phase 2 (bound): per-slot upper bound = Σ_t UB_t(block of t whose slot
    range covers the slot) via ``np.repeat`` — O(N·terms) SIMD; candidates
    are slots whose bound beats the threshold.
    Phase 3 (verify): decode exactly the blocks whose slot range contains a
    candidate, score them, and take the top-k over candidates only.

    The classic doc-at-a-time WAND skips more postings, but its per-pivot
    cost is interpreted Python; this formulation keeps every inner loop in
    numpy and still never touches blocks that cannot contain a winner.
    """
    N = reader.num_docs
    dl_arr = reader.doc_lens

    def block_scores(c, blk):
        slots, tfs = reader.decode_block(c.row, blk)
        dls = dl_arr[slots]
        valid = dls > 0  # tombstones
        slots, tfs, dls = slots[valid], tfs[valid], dls[valid]
        if not slots.size:
            return slots, np.empty(0)
        return slots, term_scores(tfs, dls, c.idf, scoring, k1, b, avgdl)

    # ---- phase 1: seed threshold from the richest blocks -----------------
    # Top-C block selection via argpartition over the concatenated
    # blk_ub arrays — O(B + C log C) vectorized — instead of
    # materializing and fully sorting a Python (ub, ti, blk) tuple list
    # (O(B log B) interpreted work on Zipf-head terms with tens of
    # thousands of blocks).  The seed threshold is a CONSERVATIVE
    # optimization: partial accumulated scores are lower bounds of true
    # scores, so under-seeding only weakens phase-2 pruning, never
    # top-k exactness — capping C is safe.  Blocks hold up to 128
    # postings, so C blocks cover the posting budget with a wide margin
    # even under heavy tombstoning.
    budget = max(4 * k, 512)
    flat_ub = (
        np.concatenate(
            [np.asarray(c.blk_ub, dtype=np.float64) for c in cursors]
        )
        if cursors else np.empty(0, dtype=np.float64)
    )
    B = flat_ub.size
    C = min(B, max(budget // 16, 256))
    if 0 < C < B:
        part = np.argpartition(-flat_ub, C - 1)[:C]
        order = part[np.argsort(-flat_ub[part], kind="stable")]
    else:
        order = np.argsort(-flat_ub, kind="stable")
    starts = np.cumsum([0] + [c.nblocks for c in cursors])
    acc = np.zeros(N, dtype=np.float64)
    touched_parts = []
    n_seeded = 0
    for fi in order:
        if n_seeded >= budget:
            break
        ti = int(np.searchsorted(starts, fi, side="right")) - 1
        slots, s = block_scores(cursors[ti], int(fi - starts[ti]))
        acc[slots] += s
        touched_parts.append(slots)
        n_seeded += slots.size
    threshold = initial_threshold
    if touched_parts:
        seen = np.unique(np.concatenate(touched_parts))
        if seen.size >= k:
            partial = acc[seen]
            kth = np.partition(partial, seen.size - k)[seen.size - k]
            threshold = max(threshold, float(kth))

    # ---- phase 2: per-slot upper bounds, candidate selection -------------
    ub_arr = np.zeros(N, dtype=np.float64)
    for c in cursors:
        spans = np.empty(c.nblocks, dtype=np.int64)
        spans[0] = int(c.blk_last[0]) + 1
        if c.nblocks > 1:
            spans[1:] = np.diff(c.blk_last.astype(np.int64))
        ub_arr[: int(c.blk_last[-1]) + 1] += np.repeat(
            np.asarray(c.blk_ub, dtype=np.float64), spans
        )
    cand = np.flatnonzero(ub_arr > threshold * (1 - _EPS))
    if cand.size == 0:
        # fall back to whatever the seed produced
        if not touched_parts:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), -1
        cand = np.unique(np.concatenate(touched_parts))

    # ---- phase 3: exact scoring over candidate-bearing blocks ------------
    acc2 = np.zeros(N, dtype=np.float64)
    for ti, c in enumerate(cursors):
        blocks = np.unique(np.searchsorted(c.blk_last, cand, side="left"))
        blocks = blocks[blocks < c.nblocks]
        if blocks.size > max(8, c.nblocks // 4):
            # weak pruning: whole-list decode beats per-block overhead
            slots, s = _score_full_term(reader, c, scoring, k1, b, avgdl)
            acc2[slots] += s
            continue
        for blk in blocks:
            slots, s = block_scores(c, int(blk))
            acc2[slots] += s
    scores = acc2[cand]
    nz = scores > 0
    cand, scores = cand[nz], scores[nz]
    top_slots, top_scores = _topk_by_score(cand, scores, k)
    return top_slots, top_scores, -1


def _score_full_term(reader, c: _Cursor, scoring, k1, b, avgdl):
    """One-shot decode + score of a whole posting list (cheaper than
    per-block decode once most blocks survive pruning)."""
    slots, tfs = reader.postings_slots_by_row(c.row)
    dls = reader.doc_lens[slots]
    valid = dls > 0
    slots, tfs, dls = slots[valid], tfs[valid], dls[valid]
    if not slots.size:
        return slots, np.empty(0)
    return slots, term_scores(tfs, dls, c.idf, scoring, k1, b, avgdl)


def _wand_single_term(reader, c: _Cursor, k, scoring, k1, b, avgdl,
                      initial_threshold):
    order = np.argsort(-c.blk_ub, kind="stable")
    threshold = initial_threshold
    parts_s: list[np.ndarray] = []
    parts_sc: list[np.ndarray] = []

    # seed the threshold from the few highest-UB blocks (single-term block
    # scores are EXACT doc scores, so the k-th best seen is a threshold)
    m = min(order.size, (2 * k) // reader.block_size + 2)
    seen = 0
    for blk in order[:m]:
        slots, tfs = reader.decode_block(c.row, blk)
        dls = reader.doc_lens[slots]
        valid = dls > 0
        slots, dls, tfs = slots[valid], dls[valid], tfs[valid]
        if not slots.size:
            continue
        s = term_scores(tfs, dls, c.idf, scoring, k1, b, avgdl)
        parts_s.append(slots)
        parts_sc.append(s)
        seen += slots.size
    if seen >= k:
        all_sc = np.concatenate(parts_sc)
        kth = np.partition(all_sc, all_sc.size - k)[all_sc.size - k]
        threshold = max(threshold, float(kth))

    rest = order[m:]
    surviving = rest[c.blk_ub[rest] > threshold * (1 - _EPS)] if threshold > 0 else rest
    if surviving.size > max(8, c.nblocks // 4):
        # weak pruning: one whole-list decode beats per-block overhead
        slots, s = _score_full_term(reader, c, scoring, k1, b, avgdl)
        top_s, top_sc = _topk_by_score(slots, s, k)
        return top_s, top_sc, -1
    for blk in surviving:
        slots, tfs = reader.decode_block(c.row, int(blk))
        dls = reader.doc_lens[slots]
        valid = dls > 0
        slots, dls, tfs = slots[valid], dls[valid], tfs[valid]
        if not slots.size:
            continue
        parts_s.append(slots)
        parts_sc.append(term_scores(tfs, dls, c.idf, scoring, k1, b, avgdl))
    if not parts_s:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), -1
    top_s, top_sc = _topk_by_score(
        np.concatenate(parts_s), np.concatenate(parts_sc), k
    )
    return top_s, top_sc, -1


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED-unique int64 arrays: binary-search the
    smaller into the larger — O(min log max), no re-sort (np.intersect1d
    sorts the concatenation even with assume_unique).  The idx clamp
    (out-of-range hits redirected to slot 0) keeps the gather in-bounds;
    a false positive there would require b[0] == a[i] with a[i] > b[-1],
    impossible for sorted inputs."""
    if a.size > b.size:
        a, b = b, a
    if not a.size:
        return a
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = 0
    return a[b[idx] == a]


def phrase_eval(
    reader: SegmentReader,
    phrases: list[list[str]],
    residual_terms: list[str],
    size: int,
    slops: list[int] | None = None,
    max_expansions: int = 50,
    prefix_expand: bool = True,
):
    """Quoted-phrase retrieval over stored positions (beyond the reference,
    whose PHRASE grammar was never implemented — ``README.md:39-48`` vs the
    discarded position data).  A doc matches iff every phrase occurs with
    adjacent PROCESSED-token positions and contains every residual term.
    Returns (first `size` matching global doc_ids ascending, local count).

    Fully vectorized: adjacency for ALL candidate docs at once via
    composite ``slot<<32 | position`` keys — ``keys(t_i) + 1`` intersected
    with ``keys(t_{i+1})`` walks the phrase left to right (positions are
    < 2^32, so +1 never carries into the slot half).  No per-candidate
    Python loop.

    ``slops[i]`` relaxes phrase i to Lucene proximity syntax
    (``"a b"~N``): terms must appear IN ORDER at strictly increasing
    positions p_1 < ... < p_n with total slack
    ``(p_n - p_1) - (n - 1) <= slop``.  (This is the in-order subset of
    Lucene's sloppy-phrase move metric — out-of-order matches, which
    Lucene admits at slop >= 2 by counting each transposition as two
    moves, are intentionally NOT matched; the in-order window semantics
    is exactly SQL-twinnable.)  Implemented as a slack-budget DP over the
    same composite keys: R[c] = positions where the prefix can end having
    spent <= c slack; each step intersects
    ``union_d(R[c-d] + 1 + d)`` with the next term's keys — O(slop^2)
    vector ops per term, zero per-candidate work.

    A phrase term ending in ``*`` is a PREFIX term (ES match_phrase_prefix,
    only when ``prefix_expand`` — span/intervals delegates pass False so
    their clause terms stay literal like Lucene span terms):
    it expands to at most ``max_expansions`` dictionary terms per segment
    (sorted-dictionary range scan, ES's per-shard expansion semantics) and
    its key set is the union of the expansions' position keys — composes
    with slop unchanged."""
    empty = np.empty(0, dtype=np.int64)
    intersect = _intersect_sorted

    # candidate docs: every phrase term and residual term present.
    # Entries carry their dictionary ROW so the unpruned key build can hit
    # the reader's cross-query composite-key LRU (positions_keys_by_row).
    cand: np.ndarray | None = None
    phrase_data = []
    for phrase in phrases:
        datas = []
        for t in phrase:
            if (prefix_expand and len(t) > 1 and t.endswith("*")
                    and "*" not in t[:-1]):
                rows = reader.term_rows_matching(t, max_expansions)
                subs = [
                    (r, reader.positions_flat_by_row(r)) for r in rows
                ]
                if not subs:
                    return empty, 0
                slots_u = (
                    np.unique(np.concatenate([d[0] for _, d in subs]))
                    if len(subs) > 1
                    else subs[0][1][0]
                )
                datas.append(subs)  # list marks a prefix expansion
                docs = slots_u
            else:
                row = reader.term_row(t)
                if row is None:
                    return empty, 0
                datas.append((row, reader.positions_flat_by_row(row)))
                docs = datas[-1][1][0]
            cand = docs if cand is None else intersect(cand, docs)
            if not cand.size:
                return empty, 0
        phrase_data.append(datas)
    for t in residual_terms:
        res = reader.postings_slots(t)
        if res is None:
            return empty, 0
        cand = res[0] if cand is None else intersect(cand, res[0])
        if not cand.size:
            return empty, 0
    if cand is None:
        return empty, 0
    cand = cand[reader.doc_lens[cand] >= 0]  # tombstones

    _tk_cache: dict = {}

    def term_keys(entry, cand_now: np.ndarray) -> np.ndarray:
        """Sorted unique (slot<<32 | pos) keys restricted to cand_now
        (cand_now ⊆ data's slots by construction): one ragged gather.
        Memoized per (term-data, cand) identity — a repeated-word phrase
        ("tawe tawe") computes its key set once, not per occurrence."""
        row, data = entry
        memo_key = (row, id(cand_now))
        hit = _tk_cache.get(memo_key)
        if hit is not None:
            return hit
        slots, counts, flat, offsets = data
        if cand_now.size * 4 >= slots.size:
            # candidates cover most of the term's docs: the per-query
            # gather would rebuild ~the whole key set, so serve the FULL
            # query-independent array from the reader's cross-query LRU
            # instead (supersets are safe — the caller intersects the
            # final doc set with cand)
            res = reader.positions_keys_by_row(row)
        else:
            idx = np.searchsorted(slots, cand_now)
            sel_cnt = counts[idx]
            sel_off = offsets[idx]
            total = int(sel_cnt.sum())
            dst0 = np.zeros(sel_cnt.size, dtype=np.int64)
            if sel_cnt.size:
                np.cumsum(sel_cnt[:-1], out=dst0[1:])
            gather = (
                np.repeat(sel_off - dst0, sel_cnt)
                + np.arange(total, dtype=np.int64)
            )
            doc_rep = np.repeat(cand_now, sel_cnt)
            res = (doc_rep << np.int64(32)) | flat[gather].astype(
                np.int64, copy=False
            )
        _tk_cache[memo_key] = res
        return res

    def keys_for(entry, cand_now: np.ndarray) -> np.ndarray:
        """Key set for a phrase slot: plain term -> term_keys; prefix
        expansion -> union of each expansion's keys (each restricted to the
        candidates it actually contains — term_keys requires cand ⊆ slots)."""
        if isinstance(entry, list):  # prefix expansion
            parts = []
            for row_data in entry:
                c = intersect(cand_now, row_data[1][0])
                if c.size:
                    parts.append(term_keys(row_data, c))
            if not parts:
                return empty
            return (
                np.unique(np.concatenate(parts)) if len(parts) > 1 else parts[0]
            )
        return term_keys(entry, cand_now)

    # verify each phrase over the surviving candidates (keys shrink as
    # earlier phrases prune cand)
    for pi, datas in enumerate(phrase_data):
        if not cand.size:
            break
        slop = slops[pi] if slops else 0
        # memo scope = one phrase's inner loop (cand constant there); a
        # freed array's id could be reused across phrases, so clear
        _tk_cache.clear()
        if slop <= 0:
            if (
                len(datas) == 2
                and isinstance(datas[0], tuple)
                and isinstance(datas[1], tuple)
            ):
                # pure two-term phrase (the dominant phrase shape, and the
                # p99 when both terms are Zipf heads): the match set is
                # query-independent, so serve it from the reader's
                # phrase-filter LRU instead of walking ~N keys per query
                docs = reader.adjacent_docs_by_rows(datas[0][0], datas[1][0])
                cand = intersect(cand, docs) if docs.size else empty
                continue
            if len(datas) > 2:
                # pairwise pre-prune: a phrase match requires every
                # consecutive bigram to match, so intersect the cached pair
                # filters first — the key walk below then runs over (and
                # gathers keys for) the shrunken candidate set
                for da, db in zip(datas, datas[1:]):
                    if isinstance(da, tuple) and isinstance(db, tuple):
                        docs = reader.adjacent_docs_by_rows(da[0], db[0])
                        cand = intersect(cand, docs) if docs.size else empty
                        if not cand.size:
                            break
                if not cand.size:
                    break
            pool = _scratch()
            cur = keys_for(datas[0], cand)
            for data in datas[1:]:
                if not cur.size:
                    break
                nxt = keys_for(data, cand)
                if nxt is cur:
                    # repeated-word step ("tawe tawe run"): keys are sorted
                    # and consecutive same-doc positions are ADJACENT in the
                    # array, so intersect(cur+1, cur) is one O(n) comparison
                    # — no binary search over the Zipf-head stream.  Scratch
                    # ``out=`` temps: fresh pages cost ~8x the arithmetic
                    # on this host (see _ScratchPool).
                    n1 = cur.size - 1
                    shifted = pool.i64_buf(n1)
                    np.add(cur[:-1], 1, out=shifted)
                    m = pool.bool_buf(n1)
                    np.equal(cur[1:], shifted, out=m)
                    cur = cur[1:][m]
                else:
                    shifted = pool.i64_buf(cur.size)
                    np.add(cur, 1, out=shifted)
                    cur = intersect(shifted, nxt)
        else:
            # slack-budget DP: R[c] = sorted keys where the prefix ends
            # with total slack <= c (so R[c] ⊆ R[c+1]); first term costs 0
            first = keys_for(datas[0], cand)
            R = [first] * (slop + 1)
            for data in datas[1:]:
                if not R[slop].size:
                    break
                nxt = keys_for(data, cand)
                newR = []
                for c in range(slop + 1):
                    parts = [R[c - d] + np.int64(1 + d) for d in range(c + 1)]
                    u = (
                        np.unique(np.concatenate(parts))
                        if len(parts) > 1
                        else parts[0]
                    )
                    newR.append(intersect(u, nxt))
                R = newR
            cur = R[slop]
        # intersect (not assign): key sets may be SUPERSETS of cand when
        # the full cached arrays were used, and cand already encodes the
        # other phrases' and residual terms' constraints + tombstones
        if cur.size:
            # cur is sorted, so the doc halves are non-decreasing: O(n)
            # dedupe in scratch instead of np.unique's O(n log n) re-sort
            pool = _scratch()
            v = pool.i64_buf(cur.size)
            np.right_shift(cur, np.int64(32), out=v)
            keep = pool.bool_buf(cur.size)
            keep[0] = True
            np.not_equal(v[1:], v[:-1], out=keep[1:])
            cand = intersect(cand, v[keep])
        else:
            cand = empty
    return cand[:size] + reader.doc_id_base, int(cand.size)


def span_near_eval(
    reader: SegmentReader,
    terms: list[str],
    slop: int,
    in_order: bool,
    size: int,
):
    """ES/Lucene ``span_near`` over single-term clauses.  ``in_order=True``
    is exactly the sloppy-phrase window (total in-order slack
    ``(p_n - p_1) - (n - 1) <= slop``) and delegates to ``phrase_eval``.
    ``in_order=False`` matches a doc iff one occurrence of EVERY term fits
    in a window of ``slop + n`` consecutive positions, any order
    (equivalently ``max(p) - min(p) - (n - 1) <= slop``; distinct terms
    can't share a position, so the chosen occurrences are automatically
    distinct — duplicate clauses are rejected at the driver).

    Vectorized window-anchor scan, no per-doc loop: every minimal window
    starts at some occurrence, so over the union U of the terms' composite
    ``(slot<<32 | pos)`` key arrays, a doc matches iff some anchor ``a ∈ U``
    has ``nextocc_t(a) - a <= slop + n - 1`` for all terms t (cross-doc
    false positives impossible: a different slot differs by >= 2^32).
    Returns (first ``size`` matching global doc_ids ascending, count)."""
    empty = np.empty(0, dtype=np.int64)
    if in_order:
        # prefix_expand=False: span/intervals clause terms are LITERAL —
        # ES never wildcard-expands a span_term, and the unordered path /
        # the unlimited-gap chain walk both look the term up literally,
        # so a trailing-* token must not flip semantics on in_order
        return phrase_eval(reader, [list(terms)], [], size, slops=[slop],
                           prefix_expand=False)
    intersect = _intersect_sorted

    cand: np.ndarray | None = None
    rows = []
    for t in terms:
        row = reader.term_row(t)
        if row is None:
            return empty, 0
        rows.append(row)
        docs = reader.positions_flat_by_row(row)[0]
        cand = docs if cand is None else intersect(cand, docs)
        if not cand.size:
            return empty, 0
    cand = cand[reader.doc_lens[cand] >= 0]  # tombstones
    if not cand.size:
        return empty, 0
    keysets = [reader.positions_keys_by_row(r) for r in rows]
    anchors = (
        np.unique(np.concatenate(keysets))
        if len(keysets) > 1 else keysets[0]
    )
    width = np.int64(slop + len(terms) - 1)
    ok = np.ones(anchors.size, dtype=bool)
    far = np.int64(1) << np.int64(62)
    for keys in keysets:
        idx = np.searchsorted(keys, anchors)
        nxt = np.where(
            idx < keys.size, keys[np.minimum(idx, keys.size - 1)], far
        )
        ok &= (nxt - anchors) <= width
    hit = anchors[ok]
    if not hit.size:
        return empty, 0
    slots = np.unique(hit >> np.int64(32))
    # key sets are query-independent (full LRU arrays): re-impose the
    # all-terms + tombstone candidate set
    slots = intersect(slots, cand)
    return slots[:size] + reader.doc_id_base, int(slots.size)


def span_not_eval(
    reader: SegmentReader,
    include_term: str,
    exclude_terms: list[str],
    pre: int,
    post: int,
    size: int,
):
    """ES/Lucene ``span_not`` over single-term clauses: keep docs where
    the include term has at least one occurrence with NO exclude-term
    occurrence overlapping it or within ``pre`` positions before /
    ``post`` positions after (Lucene's pre/post windows; width-1 spans
    make overlap = same position).  Vectorized: one searchsorted of the
    include key array into the union of the exclude terms' key arrays —
    an exclude key q kills include key p iff ``p - pre <= q <= p +
    post``.  Cross-doc false kills are impossible: composite keys of
    different slots differ by >= 2^32 while pre/post windows are tiny.
    Returns (first ``size`` matching global doc_ids ascending, count)."""
    empty = np.empty(0, dtype=np.int64)
    if pre < 0 or post < 0:
        raise ValueError("span_not pre/post must be >= 0")
    if pre >= (1 << 31) or post >= (1 << 31):
        # positions fit 32 bits: a window this wide would cross the
        # slot<<32 boundary and break the cross-doc-safety invariant
        raise ValueError("span_not pre/post must be < 2^31")
    row = reader.term_row(include_term)
    if row is None:
        return empty, 0
    inc = reader.positions_keys_by_row(row)
    exc_parts = []
    for t in exclude_terms:
        r2 = reader.term_row(t)
        if r2 is not None:
            exc_parts.append(reader.positions_keys_by_row(r2))
    if exc_parts:
        exc = (
            np.sort(np.concatenate(exc_parts))
            if len(exc_parts) > 1 else exc_parts[0]
        )
        idx = np.searchsorted(exc, inc - np.int64(pre))
        nxt = np.where(
            idx < exc.size, exc[np.minimum(idx, exc.size - 1)],
            np.int64(1) << np.int64(62),
        )
        inc = inc[nxt > inc + np.int64(post)]
    if not inc.size:
        return empty, 0
    slots = np.unique(inc >> np.int64(32))
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


def span_first_eval(
    reader: SegmentReader,
    alt_terms: list[str],
    end: int,
    size: int,
):
    """ES/Lucene ``span_first`` over a ``span_or`` of single-term
    clauses: a doc matches iff ANY alternative term has an occurrence
    whose span end position is <= ``end``.  A single-term span at
    0-based position ``p`` has end ``p + 1`` (Lucene's exclusive span
    end), so the test is ``p <= end - 1``.  ``end=None`` degenerates to
    the plain ``span_or`` union (any alternative anywhere).

    Vectorized: each alternative's composite ``slot<<32|pos`` key array
    (shared phrase LRU) is mask-filtered on the position half — no
    per-doc loop; the union of surviving slots is the match set.
    Returns (first ``size`` matching global doc_ids ascending, count)."""
    empty = np.empty(0, dtype=np.int64)
    hits: list[np.ndarray] = []
    for t in alt_terms:
        row = reader.term_row(t)
        if row is None:
            continue
        if end is None:
            slots = reader.postings_slots_by_row(row)[0]
        else:
            keys = reader.positions_keys_by_row(row)
            pos = keys & np.int64(0xFFFFFFFF)
            slots = np.unique(keys[pos <= end - 1] >> np.int64(32))
        if slots.size:
            hits.append(slots)
    if not hits:
        return empty, 0
    slots = np.unique(np.concatenate(hits)) if len(hits) > 1 else hits[0]
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


def span_containing_eval(
    reader: SegmentReader,
    big_terms: list[str],
    little_term: str,
    slop: int,
    size: int,
):
    """ES/Lucene ``span_containing`` / ``span_within`` at doc
    granularity: docs where some enumerated span of
    ``span_near(big_terms, slop, in_order=True)`` wholly contains an
    occurrence of ``little_term``.  Lucene's NearSpansOrdered enumerates
    per-start-MINIMAL spans (for each start position the smallest end),
    NOT the interval algebra's global antichain — in "a c a b" with
    big=("a","b") the span (1,4) is enumerated (and contains "c") even
    though (3,4) ⊆ (1,4) would prune it from the minimal-interval set.
    span_within(little, big) matches the same DOC set (both assert
    ∃ big span ⊇ some little occurrence); only the returned spans
    differ, which doc ranking can't see.

    Vectorized greedy chain over composite ``slot<<32|pos`` keys: every
    anchor occurrence of the first big term chains to the next strictly
    later occurrence of each following term in the same slot (greedy
    earliest-next = per-start minimal end for single-term clauses),
    the total in-order slack ``(e - s) - (n - 1) <= slop`` filters,
    then one searchsorted of the little key array against the
    surviving [start, end] key windows tests containment — no per-doc
    loop.  Returns (first ``size`` global doc_ids ascending, count)."""
    empty = np.empty(0, dtype=np.int64)
    shift = np.int64(32)
    rows = [reader.term_row(t) for t in big_terms]
    if any(r is None for r in rows):
        return empty, 0
    lrow = reader.term_row(little_term)
    if lrow is None:
        return empty, 0
    starts = reader.positions_keys_by_row(rows[0])
    if not starts.size:
        return empty, 0
    ends = starts
    ok = np.ones(starts.size, dtype=bool)
    far = np.int64(1) << np.int64(62)
    for row in rows[1:]:
        keys = reader.positions_keys_by_row(row)
        # strictly after the current span end (ordered, non-overlapping)
        idx = np.searchsorted(keys, ends, side="right")
        nxt = np.where(
            idx < keys.size, keys[np.minimum(idx, keys.size - 1)], far
        )
        ok &= (nxt >> shift) == (ends >> shift)
        ends = np.where(ok, nxt, ends)
    starts = starts[ok]
    ends = ends[ok]
    if not starts.size:
        return empty, 0
    # same slot: the key difference IS the position difference
    keep = (ends - starts) <= np.int64(slop + len(big_terms) - 1)
    starts = starts[keep]
    ends = ends[keep]
    if not starts.size:
        return empty, 0
    lkeys = reader.positions_keys_by_row(lrow)
    idx = np.searchsorted(lkeys, starts)
    cand = np.where(
        idx < lkeys.size, lkeys[np.minimum(idx, lkeys.size - 1)], far
    )
    hit = cand <= ends
    if not hit.any():
        return empty, 0
    slots = np.unique(starts[hit] >> shift)
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


def span_multi_near_eval(
    reader: SegmentReader,
    clauses: list[tuple],
    slop: int,
    in_order: bool,
    size: int,
    max_expansions: int | None = None,
):
    """ES ``span_near`` over ``span_multi`` / ``span_term`` clauses
    (Lucene SpanMultiTermQueryWrapper): each clause tuple is
    ``("term", t)``, ``("wildcard", pat)``, ``("regexp", pat)`` or
    ``("fuzzy", term, max_edits)``, expanded against THIS segment's
    dictionary (the full ES multi-term wrapper family); a
    clause's span set is the UNION of its expanded terms' one-position
    spans (merged composite ``slot<<32|pos`` key arrays — expansion cost
    is one dictionary range scan + one k-way key merge per clause, no
    per-doc work).

    in_order=True: per-anchor greedy chain (earliest next occurrence of
    each following clause strictly after the previous link) — for
    one-position spans the greedy chain minimizes the span end for each
    start, so an ordered assignment with total slack <= slop exists iff
    a greedy one does (the NearSpansOrdered doc set).  in_order=False:
    the window-anchor scan (every minimal window starts at some clause
    occurrence; all clauses must occur in [a, a + slop + n - 1]) —
    a single position may satisfy two overlapping clauses, which
    Lucene's unordered spans permit.  Returns (first ``size`` global
    doc_ids ascending, count)."""
    empty = np.empty(0, dtype=np.int64)
    shift = np.int64(32)
    keysets: list[np.ndarray] = []
    for c in clauses:
        kind, arg = c[0], c[1]
        if kind == "wildcard":
            rows = reader.term_rows_matching(arg, max_expansions)
        elif kind == "regexp":
            rows = reader.term_rows_regexp(arg, max_expansions)
        elif kind == "fuzzy":
            rows = reader.term_rows_fuzzy(arg, c[2], max_expansions)
        else:  # term
            row = reader.term_row(arg)
            rows = [] if row is None else [row]
        if not rows:
            return empty, 0
        ks = [reader.positions_keys_by_row(r) for r in rows]
        keys = np.sort(np.concatenate(ks)) if len(ks) > 1 else ks[0]
        if not keys.size:
            return empty, 0
        keysets.append(keys)
    far = np.int64(1) << np.int64(62)
    if in_order:
        starts = keysets[0]
        ends = starts
        ok = np.ones(starts.size, dtype=bool)
        for keys in keysets[1:]:
            idx = np.searchsorted(keys, ends, side="right")
            nxt = np.where(
                idx < keys.size, keys[np.minimum(idx, keys.size - 1)], far
            )
            ok &= (nxt >> shift) == (ends >> shift)
            ends = np.where(ok, nxt, ends)
        starts = starts[ok]
        ends = ends[ok]
        if not starts.size:
            return empty, 0
        hit = starts[(ends - starts)
                     <= np.int64(slop + len(clauses) - 1)]
    else:
        anchors = (
            np.unique(np.concatenate(keysets))
            if len(keysets) > 1 else keysets[0]
        )
        width = np.int64(slop + len(clauses) - 1)
        ok = np.ones(anchors.size, dtype=bool)
        for keys in keysets:
            idx = np.searchsorted(keys, anchors)
            nxt = np.where(
                idx < keys.size, keys[np.minimum(idx, keys.size - 1)], far
            )
            ok &= (nxt - anchors) <= width
        hit = anchors[ok]
    if not hit.size:
        return empty, 0
    slots = np.unique(hit >> shift)
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


# --------------------------------------------------------------------
# ES/Lucene intervals query: minimal-interval algebra
# --------------------------------------------------------------------
#
# Rule tuples (hashable, RPC-able):
#   ("term", t)
#   ("match", (t1, ..., tn), max_gaps, ordered)
#   ("all_of", (child, ...), max_gaps, ordered)
#   ("any_of", (child, ...))
#
# Semantics are Lucene's minimal-interval algebra (the intervals query is
# DEFINED over minimal interval sets, not over exhaustive assignments):
# each combinator consumes its children's minimal sets, produces combined
# intervals, filters by max_gaps (gaps = span length minus the sum of the
# chosen child interval lengths; for flat terms this is exactly the
# in-order/unordered window slack of span_near), then prunes to the
# minimal antichain.  ordered chaining requires non-overlap
# (start > previous end), unordered allows overlaps (Lucene UNORDERED).

_IV_UNLIMITED = 1 << 30


def _iv_rule_terms(rule) -> set[str]:
    kind = rule[0]
    if kind == "term":
        return {rule[1]}
    if kind == "match":
        return set(rule[1])
    if kind == "filter":
        return _iv_rule_terms(rule[1]) | _iv_rule_terms(rule[3])
    out: set[str] = set()
    for c in rule[1]:
        out |= _iv_rule_terms(c)
    return out


# Interval filters that REQUIRE the filter rule to match somewhere in the
# doc (the source interval must relate to an existing filter interval);
# the not_* complements keep source intervals when the filter is absent.
_IV_POSITIVE_FILTERS = frozenset(
    {"containing", "contained_by", "overlapping", "before", "after"}
)
_IV_FILTER_KINDS = _IV_POSITIVE_FILTERS | frozenset(
    {"not_containing", "not_contained_by", "not_overlapping"}
)


def _iv_candidates(reader: SegmentReader, rule) -> np.ndarray:
    """Slots that could possibly match: intersection over required
    children (term/match/all_of), union over any_of — the same
    rarest-clause bound Lucene's conjunction iterators give."""
    kind = rule[0]
    empty = np.empty(0, dtype=np.int64)

    def term_docs(t):
        row = reader.term_row(t)
        if row is None:
            return empty
        return reader.positions_flat_by_row(row)[0]

    inter = _intersect_sorted

    if kind == "term":
        return term_docs(rule[1])
    if kind == "match":
        cand = None
        for t in rule[1]:
            d = term_docs(t)
            cand = d if cand is None else inter(cand, d)
            if not cand.size:
                return cand
        return cand if cand is not None else empty
    if kind == "all_of":
        cand = None
        for c in rule[1]:
            d = _iv_candidates(reader, c)
            cand = d if cand is None else inter(cand, d)
            if not cand.size:
                return cand
        return cand if cand is not None else empty
    if kind == "filter":
        src = _iv_candidates(reader, rule[1])
        if rule[2] in _IV_POSITIVE_FILTERS:
            # the filter rule must also match in the doc: rarest-clause
            # bound tightens to the intersection (Lucene's conjunction)
            return inter(src, _iv_candidates(reader, rule[3]))
        return src
    # any_of
    parts = [_iv_candidates(reader, c) for c in rule[1]]
    parts = [p for p in parts if p.size]
    if not parts:
        return empty
    return np.unique(np.concatenate(parts)) if len(parts) > 1 else parts[0]


def _iv_prune(ivs: list) -> list:
    """Minimal antichain: drop intervals that strictly contain another."""
    if len(ivs) <= 1:
        return ivs
    ivs = sorted(set(ivs))
    # equal starts: keep only the smallest end (it is contained in the rest)
    dedup = []
    for s, e in ivs:
        if dedup and dedup[-1][0] == s:
            continue  # sorted: previous has smaller end
        dedup.append((s, e))
    out = []
    min_end = None
    for s, e in reversed(dedup):
        if min_end is None or e < min_end:
            out.append((s, e))
            min_end = e
    out.reverse()
    return out


def _iv_combine(childs: list, ordered: bool, max_gaps: int) -> list:
    """Minimal combined intervals over per-child minimal sets (each an
    antichain sorted by start, so ends ascend too — greedy earliest-next
    is optimal).  Lucene order of operations: produce the combined
    minimal set FIRST, then filter it by max_gaps (``Intervals.maxgaps``
    wraps an already-minimal source)."""
    import bisect

    if any(not c for c in childs):
        return []
    cand: list = []  # (start, end, covered)
    if ordered:
        starts_per_child = [[s for s, _ in c] for c in childs]
        for s0, e0 in childs[0]:
            cur_end = e0
            covered = e0 - s0 + 1
            ok = True
            for c, starts in zip(childs[1:], starts_per_child[1:]):
                j = bisect.bisect_right(starts, cur_end)
                if j == len(c):
                    ok = False
                    break
                cs, ce = c[j]
                covered += ce - cs + 1
                cur_end = ce
            if ok:
                cand.append((s0, cur_end, covered))
    else:
        ptr = [0] * len(childs)
        n = len(childs)
        while True:
            cur = [childs[i][ptr[i]] for i in range(n)]
            s = min(c[0] for c in cur)
            e = max(c[1] for c in cur)
            covered = sum(c[1] - c[0] + 1 for c in cur)
            cand.append((s, e, covered))
            # advance the child holding the earliest start (try to shrink)
            k = min(range(n), key=lambda i: cur[i][0])
            ptr[k] += 1
            if ptr[k] == len(childs[k]):
                break
    gaps_of: dict = {}
    for s, e, cov in cand:
        # same span reachable via different child states: keep the
        # densest (fewest internal gaps)
        if (s, e) not in gaps_of or cov > gaps_of[(s, e)]:
            gaps_of[(s, e)] = cov
    minimal = _iv_prune([(s, e) for s, e, _ in cand])
    return [
        (s, e) for s, e in minimal
        if (e - s + 1) - gaps_of[(s, e)] <= max_gaps
    ]


def _iv_eval_doc(rule, positions_of) -> list:
    """Minimal interval set of ``rule`` within one doc.  ``positions_of``
    maps term -> sorted position list for this doc."""
    kind = rule[0]
    if kind == "term":
        return [(p, p) for p in positions_of(rule[1])]
    if kind == "match":
        _, terms, max_gaps, ordered = rule
        childs = [[(p, p) for p in positions_of(t)] for t in terms]
        if len(childs) == 1:
            return childs[0]
        return _iv_combine(
            childs, ordered,
            max_gaps if max_gaps >= 0 else _IV_UNLIMITED,
        )
    if kind == "all_of":
        _, children, max_gaps, ordered = rule
        childs = [_iv_eval_doc(c, positions_of) for c in children]
        if len(childs) == 1:
            return childs[0]
        return _iv_combine(
            childs, ordered,
            max_gaps if max_gaps >= 0 else _IV_UNLIMITED,
        )
    if kind == "filter":
        _, src_rule, fkind, flt_rule = rule
        src = _iv_eval_doc(src_rule, positions_of)
        if not src:
            return []
        flt = _iv_eval_doc(flt_rule, positions_of)
        return _iv_apply_filter(src, fkind, flt)
    # any_of
    out: list = []
    for c in rule[1]:
        out.extend(_iv_eval_doc(c, positions_of))
    return _iv_prune(out)


def _iv_apply_filter(src: list, fkind: str, flt: list) -> list:
    """Lucene interval filters (ES ``intervals`` ``filter`` rule) applied
    to a minimal source set against the filter rule's minimal set —
    filtering a subset of an antichain stays an antichain, so no
    re-prune.  Existential semantics throughout (a source interval
    survives if SOME filter interval relates as asked):

    - ``containing``      source [s,e] with a filter [fs,fe] inside it
    - ``contained_by``    source [s,e] inside some filter [fs,fe]
    - ``overlapping``     source overlapping some filter interval
    - ``before``          source ending before some filter's start
    - ``after``           source starting after some filter's end
    - ``not_*``           the complements over the same tests

    before/after and the overlap tests are insensitive to the filter's
    minimal-set pruning (pruning only drops an interval when a contained
    one is kept, and the kept one witnesses the same relation);
    containing/contained_by are defined against the minimal set exactly
    as Lucene's ContainedBy/ContainingIntervalsSource iterate them."""
    if fkind not in _IV_FILTER_KINDS:
        raise ValueError(f"unsupported intervals filter {fkind!r}")
    neg = fkind.startswith("not_")
    base = fkind[4:] if neg else fkind

    def rel(s: int, e: int) -> bool:
        if base == "containing":
            return any(s <= fs and fe <= e for fs, fe in flt)
        if base == "contained_by":
            return any(fs <= s and e <= fe for fs, fe in flt)
        if base == "overlapping":
            return any(fs <= e and s <= fe for fs, fe in flt)
        if base == "before":
            return any(e < fs for fs, _ in flt)
        # after
        return any(s > fe for _, fe in flt)

    return [(s, e) for s, e in src if rel(s, e) != neg]


def _ordered_chain_docs(reader: SegmentReader, terms: list[str],
                        size: int | None):
    """Docs where ``terms`` occur at strictly increasing positions in
    order, ANY distance apart (ordered match with unlimited max_gaps).
    One vectorized left-to-right walk over composite ``slot<<32|pos``
    keys: a key of term i+1 survives iff some surviving key of term i
    precedes it within the same slot — O(n_terms) vector ops, no
    slop-dependent work (the sloppy-phrase DP is O(slop^2), unusable at
    unlimited gaps)."""
    empty = np.empty(0, dtype=np.int64)
    intersect = _intersect_sorted

    rows, cand = [], None
    for t in terms:
        row = reader.term_row(t)
        if row is None:
            return empty, 0
        rows.append(row)
        docs = reader.positions_flat_by_row(row)[0]
        cand = docs if cand is None else intersect(cand, docs)
        if not cand.size:
            return empty, 0
    cand = cand[reader.doc_lens[cand] >= 0]
    if not cand.size:
        return empty, 0
    shift = np.int64(32)
    surv = reader.positions_keys_by_row(rows[0])
    for row in rows[1:]:
        if not surv.size:
            return empty, 0
        keys = reader.positions_keys_by_row(row)
        idx = np.searchsorted(surv, keys)  # surviving keys strictly before
        ok = idx > 0
        prev = surv[np.maximum(idx - 1, 0)]
        ok &= (prev >> shift) == (keys >> shift)
        surv = keys[ok]
    slots = np.unique(surv >> shift)
    slots = intersect(slots, cand)  # re-impose tombstone/candidate set
    return slots[:size] + reader.doc_id_base, int(slots.size)


def _iv_minimal_pairs_vec(reader: SegmentReader, t1: str, t2: str,
                          max_gaps: int):
    """Vectorized minimal-interval set of the flat ordered 2-term match
    (t1, t2) over composite ``slot<<32|pos`` keys: greedy ends (first t2
    strictly after each t1), antichain prune (a pair is minimal iff no
    t1 lies strictly inside — i.e. the NEXT t1 key is already past the
    end; a next key in another slot is past it trivially), THEN the
    max_gaps filter (Lucene's order of operations).  Returns sorted
    (start_keys, end_keys) arrays, or None when either term is absent."""
    r1 = reader.term_row(t1)
    r2 = reader.term_row(t2)
    if r1 is None or r2 is None:
        return None
    k1 = reader.positions_keys_by_row(r1)
    k2 = reader.positions_keys_by_row(r2)
    if not k1.size or not k2.size:
        return None
    far = np.int64(1) << np.int64(62)
    idx = np.searchsorted(k2, k1, side="right")
    e = np.where(idx < k2.size, k2[np.minimum(idx, k2.size - 1)], far)
    ok = (e >> np.int64(32)) == (k1 >> np.int64(32))
    nxt1 = np.empty_like(k1)
    nxt1[:-1] = k1[1:]
    nxt1[-1] = far
    # antichain: no t1 STRICTLY inside (s, e).  >= not >: with t1 == t2
    # (duplicate-term match) the next t1 key IS the greedy end itself,
    # which sits on the boundary, so consecutive-occurrence pairs are
    # all minimal; for distinct terms nxt1 == e is impossible and the
    # two comparisons agree.
    ok &= nxt1 >= e
    if max_gaps >= 0:
        ok &= (e - k1) <= np.int64(max_gaps + 1)
    s = k1[ok]
    return s, e[ok]


def _iv_filter_fast(reader: SegmentReader, rule, size: int | None):
    """Vectorized fast path for the common interval-filter shapes —
    flat ordered 2-term match source with a term filter (containing /
    not_containing) and term source with a flat-pair filter
    (contained_by / not_contained_by / before / after + not_*).
    Returns (ids, total) or None when the shape doesn't match (the
    per-doc algebra handles the general case)."""
    _, src, fkind, flt = rule
    shift = np.int64(32)
    far = np.int64(1) << np.int64(62)
    empty = np.empty(0, dtype=np.int64)

    def done(slots):
        slots = slots[reader.doc_lens[slots] >= 0]
        return slots[:size] + reader.doc_id_base, int(slots.size)

    if (src[0] == "match" and len(src[1]) == 2 and src[3]
            and flt[0] == "term"
            and fkind in ("containing", "not_containing")):
        got = _iv_minimal_pairs_vec(reader, src[1][0], src[1][1], src[2])
        if got is None:
            return empty, 0
        s, e = got
        if not s.size:
            return empty, 0
        frow = reader.term_row(flt[1])
        if frow is None:
            hit = np.zeros(s.size, dtype=bool)
        else:
            fk = reader.positions_keys_by_row(frow)
            idx = np.searchsorted(fk, s)
            cand = np.where(
                idx < fk.size, fk[np.minimum(idx, fk.size - 1)], far)
            hit = cand <= e
        keep = hit if fkind == "containing" else ~hit
        return done(np.unique(s[keep] >> shift))

    if (src[0] == "term" and flt[0] == "match" and len(flt[1]) == 2
            and flt[3]
            and fkind in ("contained_by", "not_contained_by",
                          "before", "after")):
        srow = reader.term_row(src[1])
        if srow is None:
            return empty, 0
        p = reader.positions_keys_by_row(srow)
        if not p.size:
            return empty, 0
        got = _iv_minimal_pairs_vec(reader, flt[1][0], flt[1][1], flt[2])
        neg = fkind.startswith("not_")
        base = fkind[4:] if neg else fkind
        if got is None or not got[0].size:
            hit = np.zeros(p.size, dtype=bool)
        else:
            fs, fe = got
            if base == "contained_by":
                # antichain: starts AND ends ascend, so the pair with
                # the largest start <= p also has the largest end
                idx = np.searchsorted(fs, p, side="right") - 1
                prev_e = np.where(
                    idx >= 0, fe[np.maximum(idx, 0)], np.int64(-1))
                hit = prev_e >= p  # same-slot implied: fs <= p <= fe
            elif base == "before":
                # source [p,p] ends before some pair start in this slot
                idx = np.searchsorted(fs, p, side="right")
                nxt = np.where(
                    idx < fs.size, fs[np.minimum(idx, fs.size - 1)], far)
                hit = (nxt >> shift) == (p >> shift)
            else:  # after: some pair end < p in this slot
                idx = np.searchsorted(fe, p) - 1
                prev = np.where(
                    idx >= 0, fe[np.maximum(idx, 0)], np.int64(-1))
                hit = (prev >= 0) & ((prev >> shift) == (p >> shift))
        keep = ~hit if neg else hit
        return done(np.unique(p[keep] >> shift))

    return None


def intervals_eval(reader: SegmentReader, rule, size: int | None):
    """ES ``intervals`` query over stored positions.  Flat rules
    (term / single-level match) delegate to the vectorized phrase /
    span_near kernels — for flat terms the max_gaps filter depends only
    on the window endpoints, so minimal-interval matching coincides with
    the window semantics those kernels implement.  (Ordered flat match
    with unlimited gaps uses a dedicated O(n) chain walk; with a large
    finite gap budget it falls through to the per-doc algebra — the
    sloppy-phrase DP is O(max_gaps^2).)  Nested rules run the per-doc
    minimal-interval algebra over the candidate set (intersection of
    required clauses — the rarest-clause bound, Lucene's conjunction
    iterator design).  Returns (first ``size`` global doc_ids ascending,
    local match count)."""
    empty = np.empty(0, dtype=np.int64)
    if rule[0] == "filter":
        fast = _iv_filter_fast(reader, rule, size)
        if fast is not None:
            return fast
    if rule[0] == "term":
        res = reader.postings_slots(rule[1])
        if res is None:
            return empty, 0
        slots = res[0]
        slots = slots[reader.doc_lens[slots] >= 0]
        return slots[:size] + reader.doc_id_base, int(slots.size)
    if rule[0] == "match":
        _, terms, max_gaps, ordered = rule
        if ordered and max_gaps < 0:
            return _ordered_chain_docs(reader, list(terms), size)
        if not ordered or max_gaps <= 32:
            slop = max_gaps if max_gaps >= 0 else _IV_UNLIMITED
            return span_near_eval(reader, list(terms), slop, ordered, size)
        # ordered with a large finite gap budget: per-doc algebra below
    cand = _iv_candidates(reader, rule)
    if cand.size:
        cand = cand[reader.doc_lens[cand] >= 0]
    if not cand.size:
        return empty, 0
    term_keys = {
        t: reader.positions_keys_by_row(row)
        for t in _iv_rule_terms(rule)
        if (row := reader.term_row(t)) is not None
    }
    hits = []
    shift = np.int64(32)
    for slot in cand:
        lo = np.int64(slot) << shift
        hi = np.int64(slot + 1) << shift

        def positions_of(t, _lo=lo, _hi=hi):
            keys = term_keys.get(t)
            if keys is None:
                return []
            i = np.searchsorted(keys, _lo)
            j = np.searchsorted(keys, _hi)
            return (keys[i:j] & np.int64(0xFFFFFFFF)).tolist()

        if _iv_eval_doc(rule, positions_of):
            hits.append(slot)
    slots = np.asarray(hits, dtype=np.int64)
    return slots[:size] + reader.doc_id_base, int(slots.size)


def wildcard_eval(
    reader: SegmentReader,
    pattern: str,
    size: int,
    max_expansions: int | None = None,
):
    """ES wildcard/prefix term query: docs containing ANY dictionary term
    matching the glob pattern (boolean-OR semantics, doc_id ascending,
    exact total).  Wildcard queries are NOT analyzed (ES behavior): the
    lowercased pattern matches the stored dictionary terms directly.
    Returns (first ``size`` matching global doc_ids, local match count)."""
    slots = _expansion_slots(reader, reader.term_rows_matching(
        pattern, max_expansions))
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


def regexp_eval(
    reader: SegmentReader,
    pattern: str,
    size: int,
    max_expansions: int | None = None,
):
    """ES regexp term query: docs containing ANY dictionary term fully
    matching the RE2 pattern (boolean-OR semantics, doc_id ascending,
    exact total).  Like wildcard/fuzzy, the pattern is NOT analyzed — it
    matches stored dictionary terms directly."""
    slots = _expansion_slots(reader, reader.term_rows_regexp(
        pattern, max_expansions))
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


def fuzzy_eval(
    reader: SegmentReader,
    term: str,
    max_edits: int,
    size: int,
    max_expansions: int | None = None,
):
    """ES fuzzy term query: docs containing ANY dictionary term within
    Levenshtein distance ``max_edits`` of ``term`` (boolean-OR over the
    expanded terms, doc_id ascending, exact total).  Like wildcard, fuzzy
    terms are NOT analyzed (ES behavior) — the lowercased term matches
    stored dictionary terms; ``transpositions=false`` metric."""
    slots = _expansion_slots(reader, reader.term_rows_fuzzy(
        term, max_edits, max_expansions))
    slots = slots[reader.doc_lens[slots] >= 0]  # tombstones
    return slots[:size] + reader.doc_id_base, int(slots.size)


class _LazyTerm:
    """Un-decoded posting list on the boolean stack — lets AND use the
    128-block skip structure (decode only blocks that can intersect the
    other operand) the way the reference's skip-pointer merge does
    (``selfindex_i1_skip_pointers.py:84-118``), but vectorized per block."""

    __slots__ = ("row", "df")

    def __init__(self, row: int, df: int):
        self.row = row
        self.df = df


def _lazy_full(reader: SegmentReader, x) -> np.ndarray:
    if isinstance(x, _LazyTerm):
        return reader.postings_slots_by_row(x.row)[0]
    return x


def _skip_intersect(reader: SegmentReader, lazy: _LazyTerm,
                    cand: np.ndarray) -> np.ndarray:
    """slots(lazy) ∩ cand, decoding only the blocks of ``lazy`` whose slot
    range can contain a candidate (block skipping via blk_last)."""
    if cand.size == 0:
        return cand
    blk_last, _, _ = reader.block_meta_by_row(lazy.row)
    nblocks = blk_last.size
    blocks = np.unique(np.searchsorted(blk_last, cand, side="left"))
    blocks = blocks[blocks < nblocks]
    if blocks.size > max(8, nblocks // 4):
        # weak pruning: one whole-list decode beats per-block overhead
        slots = reader.postings_slots_by_row(lazy.row)[0]
        return np.intersect1d(slots, cand, assume_unique=True)
    parts = [reader.decode_block(lazy.row, int(b))[0] for b in blocks]
    if not parts:
        return cand[:0]
    return np.intersect1d(np.concatenate(parts), cand, assume_unique=True)


def _expansion_slots(reader: SegmentReader, rows) -> np.ndarray:
    """Union of live posting slots over expanded dictionary rows (the
    per-segment multi-term rewrite Lucene applies to wildcard / fuzzy /
    regexp operands)."""
    if not rows:
        return np.empty(0, dtype=np.int64)
    arrs = [reader.postings_slots_by_row(r)[0] for r in rows]
    slots = np.unique(np.concatenate(arrs)) if len(arrs) > 1 else arrs[0]
    return slots


def _special_slots(reader: SegmentReader, spec) -> np.ndarray:
    """Resolve a typed placeholder operand to its sorted slot set.

    ``spec`` is either the legacy phrase tuple ``(terms, slop)`` or a
    typed spec: ``("phrase", terms, slop)``, ``("wildcard", pattern)``,
    ``("fuzzy", term, max_edits)``, ``("regexp", pattern)`` — each
    resolved per segment exactly the way its standalone query path
    resolves it (dictionary expansion / positions machinery)."""
    kind = spec[0] if isinstance(spec[0], str) else "phrase"
    if kind == "phrase":
        terms, slop = spec[1:] if isinstance(spec[0], str) else spec
        ids, _ = phrase_eval(reader, [terms], [], None, slops=[slop])
        return ids - reader.doc_id_base
    if kind == "wildcard":
        return _expansion_slots(
            reader, reader.term_rows_matching(spec[1], None))
    if kind == "fuzzy":
        return _expansion_slots(
            reader, reader.term_rows_fuzzy(spec[1], spec[2]))
    if kind == "regexp":
        return _expansion_slots(
            reader, reader.term_rows_regexp(spec[1], None))
    raise ValueError(f"unknown special operand kind: {kind!r}")


def boolean_eval(reader: SegmentReader, rpn: tuple[str, ...], size: int,
                 phrase_ops: dict[str, tuple[list[str], int]] | None = None):
    """RPN evaluation over sorted slot arrays (reference Q5 engine,
    ``measure_latency_datastores.py:137-188``).  AND of term operands is
    skip-accelerated: the lower-df side decodes fully, the other side
    decodes only candidate-bearing blocks.  ``phrase_ops`` maps placeholder
    operands to typed specs resolved by ``_special_slots`` — quoted
    phrases (Lucene ``"a b"~N``), and the multi-term wildcard / fuzzy /
    regexp operands the query_string parser emits.  Returns
    (first `size` matching global doc_ids ascending, total local matches)."""
    universe = None
    stack: list = []
    empty = np.empty(0, dtype=np.int64)
    can_skip = reader.codec != "zlib"  # zlib cells have no per-block offsets
    try:
        for token in rpn:
            if token == "AND":
                b_ = stack.pop()
                a = stack.pop()
                if isinstance(a, _LazyTerm) and isinstance(b_, _LazyTerm):
                    # decode the rarer term fully; skip-walk the other
                    small, big = (a, b_) if a.df <= b_.df else (b_, a)
                    cand = reader.postings_slots_by_row(small.row)[0]
                    stack.append(_skip_intersect(reader, big, cand))
                elif isinstance(a, _LazyTerm) or isinstance(b_, _LazyTerm):
                    lazy, arr = (a, b_) if isinstance(a, _LazyTerm) else (b_, a)
                    stack.append(_skip_intersect(reader, lazy, arr))
                else:
                    if a.size and b_.size:
                        stack.append(np.intersect1d(a, b_, assume_unique=True))
                    else:
                        stack.append(empty)
            elif token == "OR":
                b_ = _lazy_full(reader, stack.pop())
                a = _lazy_full(reader, stack.pop())
                if not a.size:
                    stack.append(b_)
                elif not b_.size:
                    stack.append(a)
                else:
                    stack.append(np.union1d(a, b_))
            elif token == "NOT":
                a = _lazy_full(reader, stack.pop())
                if universe is None:
                    universe = reader.present_doc_ids() - reader.doc_id_base
                stack.append(np.setdiff1d(universe, a, assume_unique=True))
            elif phrase_ops is not None and token in phrase_ops:
                # placeholder operand (quoted phrase / wildcard / fuzzy /
                # regexp) inside a boolean expression: resolves to sorted
                # slots — composes with AND/OR/NOT as a plain array
                stack.append(_special_slots(reader, phrase_ops[token]))
            else:
                row = reader.term_row(token)
                if row is None:
                    stack.append(empty)
                elif can_skip:
                    stack.append(_LazyTerm(row, reader.df_by_row(row)))
                else:
                    stack.append(reader.postings_slots_by_row(row)[0])
    except IndexError:
        stack = []  # malformed expression: defined as no matches (see oracle)
    result = _lazy_full(reader, stack[0]) if stack else empty
    if result.size:
        result = result[reader.doc_lens[result] >= 0]  # drop tombstoned
    return result[:size] + reader.doc_id_base, int(result.size)
