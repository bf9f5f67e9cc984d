"""Training-data text operators: deduplication and text analysis.

Beyond the reference's operator set (it has none of these — README.md
roadmap), these are the operations a large-scale training-data pipeline
needs, expressed Ray-Data-first:

- exact dedup:      content-hash in map_batches -> per-batch partial
                    dedup -> groupby(hash).map_groups keep-first.
- MinHash-LSH:      shingle -> minhash -> band rows (flat) ->
                    groupby(band) candidate pairs -> Jaccard verify.
- SimHash:          64-bit simhash + banded buckets -> Hamming verify.
- text analysis:    word counts, punctuation/stopword/upper ratios,
                    language id (n-gram heuristic), md5 fingerprint —
                    one vectorized map_batches pass.

Scale notes: every pairwise stage is confined to an LSH/band bucket
(never all-pairs); partials are per-batch so the groupby shuffles one
row per (hash|band) per batch, not full text payloads, when only ids
are needed downstream.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings

# --- exact dedup ------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One survivor (min id) per distinct text. The shuffle carries
    (hash, id, text); per-batch pre-dedup shrinks it first."""

    def partial(batch: pa.Table) -> pa.Table:
        from .streams import str_stream_from_arrow

        lengths, data, _ = str_stream_from_arrow(batch[text_col])
        h = hash_strings(lengths, data).view(np.int64)
        t = pa.table({
            "_h": pa.array(h, type=pa.int64()),
            id_col: batch[id_col],
            text_col: batch[text_col],
        })
        # keep min id per hash within the batch
        g = t.group_by("_h").aggregate([(id_col, "min")])
        keep = pc.is_in(t[id_col], value_set=g[f"{id_col}_min"].combine_chunks())
        return t.filter(keep)

    def keep_first(group):
        import pandas as pd

        # verify on the actual text (hash collisions), min id per text
        return (group.sort_values(id_col).drop_duplicates(subset=[text_col])
                [[id_col, text_col]])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(keep_first, batch_format="pandas")
    )


# --- shingles + MinHash -----------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    b = text.encode("utf-8")
    if len(b) < k:
        return np.array([hash_strings(np.array([len(b)]), b)[0]], dtype=np.uint64) \
            if b else np.array([0], dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash of every k-gram, vectorized
    weights = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    n = len(arr) - k + 1
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    return (arr[idx] * weights).sum(axis=1)


def minhash_signature(shingles: np.ndarray, n_perm: int = 64,
                      seed: int = 42) -> np.ndarray:
    """n_perm minhash values via universal hashing a*x+b mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
    x = np.unique(shingles) % np.uint64(_MERSENNE)
    # (n_perm, n_shingles) in uint64 with mersenne modulus
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      n_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.7, shingle_k: int = 5):
    """Near-duplicate pairs via MinHash + LSH banding.

    shingle->minhash per batch (vectorized per doc); explode to one row
    per (band, band_hash); groupby band bucket; verify candidate pairs
    with exact shingle Jaccard inside the bucket's group. Only
    (id, signature-band) rows travel through the shuffle. Returns
    Dataset[(id_a, id_b, jaccard)] with id_a < id_b."""
    rows_per_band = n_perm // bands

    def sig_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        out_band, out_bh, out_id, out_text, out_sig = [], [], [], [], []
        for i, t in enumerate(texts):
            sh = _char_shingles(t, shingle_k)
            sig = minhash_signature(sh, n_perm)
            bh = sig.reshape(bands, rows_per_band)
            bh = (bh * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1)
            sig_l = sig.view(np.int64).tolist()
            for band in range(bands):
                out_band.append(band)
                out_bh.append(int(bh[band]) - (1 << 63))
                out_id.append(ids[i])
                out_text.append(t)
                out_sig.append(sig_l)
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "bh": pa.array(out_bh, type=pa.int64()),
            id_col: pa.array(out_id),
            text_col: pa.array(out_text),
            "sig": pa.array(out_sig, type=pa.list_(pa.int64())),
        })

    def verify(group):
        import pandas as pd

        empty = pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        if len(group) < 2:
            return empty
        group = group.sort_values(id_col).drop_duplicates(subset=[id_col])
        m = len(group)
        if m < 2:
            return empty
        ids = group[id_col].tolist()
        texts = group[text_col].tolist()
        # vectorized candidate filter: minhash-estimated jaccard over
        # all in-bucket pairs (m x m x n_perm bools), exact shingle
        # jaccard only for survivors — keeps hot buckets O(m^2) cheap
        sigs = np.array(group["sig"].tolist(), dtype=np.int64)
        est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        cand_i, cand_j = np.nonzero(np.triu(est >= jaccard_threshold - 0.15, k=1))
        if not len(cand_i):
            return empty
        sets: dict[int, set] = {}

        def shingle_set(i):
            if i not in sets:
                sets[i] = set(_char_shingles(texts[i], shingle_k).tolist())
            return sets[i]

        a_out, b_out, j_out = [], [], []
        for i, j in zip(cand_i.tolist(), cand_j.tolist()):
            si, sj = shingle_set(i), shingle_set(j)
            union = len(si | sj)
            jac = len(si & sj) / union if union else 1.0
            if jac >= jaccard_threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                j_out.append(jac)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "jaccard": j_out})

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(verify, batch_format="pandas")
    )

    def dedup_pairs(batch):
        import pandas as pd

        return batch.drop_duplicates(subset=["id_a", "id_b"])

    # a pair can surface from several bands: final light dedup
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --- SimHash ----------------------------------------------------------------


def simhash64(texts: list[str], seed: int = 42) -> np.ndarray:
    """64-bit SimHash over word features (vectorized per doc)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.lower().split()
        if not words:
            continue
        lens = np.array([len(w.encode("utf-8", "ignore")) for w in words], dtype=np.int64)
        data = b"".join(w.encode("utf-8", "ignore") for w in words)
        h = hash_strings(lens, data)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.sum(
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    return out


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """Near-dup pairs via SimHash: band the 64-bit hash into 4 x 16-bit
    keys (any pair within Hamming<=3 shares at least one band), bucket
    by band value, verify Hamming distance in-bucket."""

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h = simhash64(texts)
        rows = {"band": [], "key": [], id_col: [], "sh": []}
        ids = batch[id_col].to_pylist()
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            rows["band"].extend([band] * len(ids))
            rows["key"].extend(key.tolist())
            rows[id_col].extend(ids)
            rows["sh"].extend(h.view(np.int64).tolist())
        return pa.table({
            "band": pa.array(rows["band"], type=pa.int32()),
            "key": pa.array(rows["key"], type=pa.int64()),
            id_col: pa.array(rows[id_col]),
            "sh": pa.array(rows["sh"], type=pa.int64()),
        })

    def verify(group):
        import pandas as pd

        group = group.sort_values(id_col).drop_duplicates(subset=[id_col])
        ids = group[id_col].tolist()
        hs = group["sh"].to_numpy().astype(np.int64).view(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            dist = np.zeros(len(ids) - i - 1, dtype=np.int64)
            x = hs[i + 1:] ^ hs[i]
            for _ in range(64):
                dist += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            hits = np.flatnonzero(dist <= max_hamming)
            for j in hits:
                a_out.append(ids[i])
                b_out.append(ids[i + 1 + j])
                d_out.append(int(dist[j]))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": d_out})

    pairs = (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --- text analysis ----------------------------------------------------------

_WORD_RE = re.compile(r"[A-Za-z0-9]+")
# BPE-style pre-tokenizer (GPT-2 pattern shape, ASCII approximation of
# \p{L}/\p{N} since the stdlib re lacks unicode property classes):
# contractions | optional-space letters | optional-space digits |
# optional-space punctuation run | whitespace
_BPE_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[A-Za-zÀ-ÖØ-öø-ÿ]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]+"
    r"|\s+"
)
_STOPWORDS = frozenset(
    "the and of a to in is it that for on as with was at by an be this have "
    "from or had not are but what all were when we there can".split()
)

# tiny n-gram language profiles (top trigrams; heuristic, deterministic)
_LANG_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "],
    "de": ["en ", "er ", " de", "der", "ie ", "ch ", "sch", "die", "ein", " ei"],
    "fr": [" de", "es ", "de ", "le ", " le", "ent", "nt ", "la ", " la", "ion"],
    "es": [" de", "de ", "os ", " la", "la ", "as ", "el ", " el", "que", " qu"],
}


class TextAnalyzer:
    """Actor-pool text analysis: compiled regexes + language profiles
    built once per actor (__init__), vectorized pandas per batch
    (__call__) — the canonical stateful map_batches stage."""

    def __init__(self):
        self.word_re = _WORD_RE
        self.punct_re = re.compile(r"[!-/:-@\[-`{-~]")
        self.profiles = {
            lang: {g: len(grams) - i for i, g in enumerate(grams)}
            for lang, grams in _LANG_PROFILES.items()
        }

    def lang_of(self, text: str) -> str:
        t = " " + text.lower()[:400] + " "
        best, best_score = "unk", 0
        for lang, prof in self.profiles.items():
            score = sum(w for g, w in prof.items() if g in t)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch):
        import pandas as pd

        text = batch["text"].astype(str)
        words = text.str.findall(self.word_re)
        n_words = words.str.len()
        batch["word_count"] = n_words.astype("int64")
        batch["punct_count"] = text.str.count(self.punct_re).astype("int64")
        nchars = text.str.len().replace(0, 1)
        batch["punct_ratio"] = batch["punct_count"] / nchars
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(w.lower() in _STOPWORDS for w in ws) / max(1, len(ws))
        )
        batch["mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        batch["pred_lang"] = text.map(self.lang_of)
        batch["fingerprint"] = text.map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
        )
        batch["bpe_token_count"] = text.map(
            lambda t: sum(1 for m in _BPE_RE.finditer(t) if not m.group().isspace())
        ).astype("int64")
        return batch


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): rolling k-gram hashes, minimum per sliding window,
    deduplicated in order. Robust to local edits — the rolling-hash
    fingerprinting of FIXTURES/prompt."""
    if not text:
        return []
    sh = _char_shingles(text, k)
    n = len(sh)
    if n == 0:
        return []
    if n <= window:
        return [int(sh.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(sh, window)
    mins = wins.min(axis=1)
    # keep first occurrence positions (classic winnowing selects the
    # rightmost min; any deterministic tie rule works for matching)
    out, prev = [], None
    for v in mins.tolist():
        if v != prev:
            out.append(int(v))
            prev = v
    return out


def winnow_table(ds, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 8, window: int = 4):
    """Per-doc winnowing fingerprints -> Dataset[(id, fingerprints)]."""

    def run(batch: pa.Table) -> pa.Table:
        fps = [winnow_fingerprints(t, k, window)
               for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "fingerprints": pa.array(
                [[f - (1 << 63) for f in fp] for fp in fps],
                type=pa.list_(pa.int64())),
        })

    return ds.map_batches(run, batch_format="pyarrow")


def analyze_text(ds, concurrency: int | None = None, batch_size: int = 4096):
    if concurrency is None:
        # leave headroom for the read stage — an actor pool that
        # reserves every CPU starves upstream operators and the
        # pipeline deadlocks (guide: size concurrency x num_cpus)
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, min(8, avail - 1))
    return ds.map_batches(TextAnalyzer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
