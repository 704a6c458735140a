"""Randomized property tests (reference §5 style: deterministic
structure, random values, independent Python oracle)."""

import random

from pyspark.sql import functions as F

from csvplus_spark import take_rows


def test_string_collation_matches_python_sorted(spark):
    rng = random.Random(7)
    vals = [str(rng.randrange(10 ** rng.randint(1, 6))) for _ in range(300)]
    f = take_rows(spark, [{"v": v} for v in vals]).ordered_by("v")
    got = [r["v"] for r in f.to_rows()]
    assert got == sorted(vals)  # python sort on str == lexicographic


def test_take_drop_while_partition_stream(spark):
    rng = random.Random(11)
    for _ in range(3):
        vals = [rng.choice(["x", "y"]) for _ in range(rng.randint(1, 40))]
        f = take_rows(spark, [{"v": v} for v in vals])
        pred = F.col("v") == "x"
        tw = [r["v"] for r in f.take_while(pred).to_rows()]
        dw = [r["v"] for r in f.drop_while(pred).to_rows()]
        # python oracle
        cut = 0
        while cut < len(vals) and vals[cut] == "x":
            cut += 1
        assert tw == vals[:cut]
        assert dw == vals[cut:]
        assert tw + dw == vals


def test_topk_matches_python(spark):
    rng = random.Random(13)
    rows = [{"k": str(rng.randrange(1000)), "u": str(i)} for i in range(200)]
    f = take_rows(spark, rows).ordered_by("k", "u", ascending=[False, True]).top(17)
    got = [(r["k"], r["u"]) for r in f.to_rows()]
    expect = sorted(((r["k"], r["u"]) for r in rows),
                    key=lambda t: (_neg(t[0]), t[1]))[:17]
    assert got == expect


def _neg(s):
    # descending lexicographic: invert each char
    return tuple(-ord(c) for c in s)


def test_chunk_docs_reconstructs_token_stream(spark):
    import re

    from csvplus_spark.operators.packing import chunk_docs

    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "delta", "x9", "qq"]
    docs = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 50))))
            for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    size = 7
    rows = chunk_docs(df, size=size).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    for did, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        chunks = sorted(got.get(did, []))
        # non-overlapping chunks concatenate back to the exact stream
        rebuilt = " ".join(c[1] for c in chunks).split()
        assert rebuilt == toks, did
        assert sum(c[2] for c in chunks) == len(toks)
        for cid, _, n in chunks[:-1]:
            assert n == size  # only the last chunk may be short


def test_simhash_pairs_match_bruteforce(spark):
    # distinct-hash expansion == naive all-pairs Hamming filter
    from csvplus_spark.operators.dedup import simhash_near_pairs
    from csvplus_spark.operators.text import simhash_table

    rng = random.Random(23)
    words = ["spark", "table", "row", "scan", "merge", "sort", "hash"]
    docs = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 12))))
            for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["doc_id_1"], r["doc_id_2"]): r["hamming"]
           for r in simhash_near_pairs(df, 3, n_bits=32).collect()}
    hashes = {r["doc_id"]: r["simhash"]
              for r in simhash_table(df, "text", "doc_id", 32).collect()}
    ids = sorted(hashes)
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(hashes[ids[i]] ^ hashes[ids[j]]).count("1")
            if h <= 3:
                want[(ids[i], ids[j])] = h
    assert got == want


def test_cutoff_order_ops_match_python_oracle(spark):
    """Randomized guard for the round-5 scalar-cutoff rewrites of
    drop/top_with_ties/take_while/drop_while: random keys WITH
    DUPLICATES and random n, compared against a sorted-list oracle.
    drop/take/drop_while compare as multisets of keys (tie picks are
    arbitrary by contract); top_with_ties compares exactly (its result
    set is deterministic even under ties)."""
    from collections import Counter

    rng = random.Random(23)
    for trial in range(4):
        n_rows = rng.randint(1, 30)
        vals = [str(rng.randint(0, 6)) for _ in range(n_rows)]
        f = take_rows(spark, [{"v": v} for v in vals]).ordered_by("v")
        sv = sorted(vals)
        for n in (0, 1, rng.randint(0, n_rows + 2), n_rows, n_rows + 3):
            got_drop = [r["v"] for r in f.drop(n).to_rows()]
            assert Counter(got_drop) == Counter(sv[n:]), (trial, n, vals)
            got_ties = [r["v"] for r in f.top_with_ties(n).to_rows()]
            if n == 0 or n > len(sv):
                expect_ties = [] if n == 0 else sv
            else:
                kth = sv[n - 1]
                expect_ties = [v for v in sv if v <= kth]
            assert Counter(got_ties) == Counter(expect_ties), (trial, n, vals)
        # latched while-ops with a mid-range threshold
        th = str(rng.randint(0, 6))
        pred = F.col("v") < th
        cut = 0
        while cut < len(sv) and sv[cut] < th:
            cut += 1
        tw = [r["v"] for r in f.take_while(pred).to_rows()]
        dw = [r["v"] for r in f.drop_while(pred).to_rows()]
        assert Counter(tw) == Counter(sv[:cut]), (trial, th, vals)
        assert Counter(dw) == Counter(sv[cut:]), (trial, th, vals)


def test_gopher_rules_match_python_oracle(spark):
    import re

    rng = random.Random(17)
    words = ["the", "and", "abc", "x99", "longishword", "a", "zz", "12345"]
    docs = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(0, 80))))
            for i in range(60)]
    from csvplus_spark.operators.text import gopher_rules

    got = {r["doc_id"]: r for r in gopher_rules(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    for i, text in docs:
        toks = re.findall("[a-z0-9]+", text.lower())
        n, chars = len(toks), sum(len(t) for t in toks)
        alpha = sum(1 for t in toks if not re.search("[0-9]", t))
        nstop = sum(1 for t in toks if t in stop)
        r = got[i]
        assert (r["n_words"], r["sum_word_chars"],
                r["n_alpha_words"], r["n_stop_hits"]) == (n, chars, alpha, nstop)
        assert r["passes_gopher"] == (
            50 <= n <= 100000 and 3 * n <= chars <= 10 * n
            and 5 * alpha >= 4 * n and nstop >= 2)


def test_novel_bigrams_match_python_oracle(spark):
    import re
    from collections import Counter

    rng = random.Random(19)
    vocab = ["red", "fox", "dog", "run", "sit"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(40)]
    from csvplus_spark.operators.text import novel_bigram_stats

    got = {r["doc_id"]: r for r in novel_bigram_stats(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    per_doc = {}
    df_count = Counter()
    for i, text in docs:
        toks = re.findall("[a-z0-9]+", text.lower())
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[i] = bgs
        df_count.update(set(bgs))
    for i, _ in docs:
        bgs = per_doc[i]
        distinct = set(bgs)
        owned = sum(1 for b in distinct if df_count[b] == 1)
        r = got[i]
        assert (r["n_bigrams"], r["n_distinct_bigrams"], r["n_owned"]) \
            == (len(bgs), len(distinct), owned)


def test_snapshot_diff_matches_python_oracle(spark):
    rng = random.Random(23)
    ids = list(range(50))
    prev = {i: f"text {rng.randrange(5)}" for i in ids if rng.random() < 0.7}
    cur = {i: (prev[i] if i in prev and rng.random() < 0.5
               else f"text {rng.randrange(5)}")
           for i in ids if rng.random() < 0.7}
    from csvplus_spark.operators.dedup import snapshot_diff

    pf = spark.createDataFrame(list(prev.items()), "doc_id long, text string")
    cf = spark.createDataFrame(list(cur.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(cf, pf).collect()}
    for i in set(prev) | set(cur):
        if i not in prev:
            want = "added"
        elif i not in cur:
            want = "removed"
        else:
            want = "unchanged" if prev[i] == cur[i] else "changed"
        assert got[i] == want, i
    assert set(got) == set(prev) | set(cur)


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_global_order_index_matches_python_oracle(spark):
    """Random unique keys: positions equal Python's sort on
    (md5-hash60, key) — the cross-engine contract of
    operators/sampling.py::global_order_index."""
    rng = random.Random(17)
    for trial in range(3):
        ids = rng.sample(range(100_000), rng.randint(1, 120))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        from csvplus_spark.operators.sampling import global_order_index

        got = {r["doc_id"]: r["pos"]
               for r in global_order_index(df, "doc_id").collect()}
        order = sorted(ids, key=lambda i: (_h60(f"shuffle|{i}"), i))
        assert got == {i: p for p, i in enumerate(order)}


def test_top_fraction_matches_python_oracle(spark):
    """Random discrete scores + random fraction: kept set equals the
    Python oracle's per-group prefix of (score desc, hash, key)."""
    import math

    rng = random.Random(19)
    for trial in range(3):
        n = rng.randint(1, 150)
        rows = [(i, rng.choice("abc"), float(rng.randint(0, 4)) / 4)
                for i in rng.sample(range(100_000), n)]
        frac = rng.choice([0.1, 0.33, 0.5, 0.9])
        df = spark.createDataFrame(rows, "doc_id long, g string, score double")
        from csvplus_spark.operators.sampling import top_fraction_by_score

        got = {r["doc_id"] for r in
               top_fraction_by_score(df, "score", "g", frac, "doc_id").collect()}
        expect = set()
        for g in "abc":
            grp = [(i, s) for i, gg, s in rows if gg == g]
            grp.sort(key=lambda t: (-t[1], _h60(f"topfrac|{t[0]}"), t[0]))
            expect |= {i for i, _ in grp[: math.ceil(frac * len(grp))]}
        assert got == expect


def test_repeated_spans_matches_python_oracle(spark):
    """Random tiny vocab corpora: reported (doc, pos, span, n_docs)
    rows equal a brute-force Python scan."""
    rng = random.Random(23)
    for trial in range(3):
        docs = []
        for i in range(rng.randint(2, 12)):
            docs.append((i, " ".join(rng.choice("abc")
                                     for _ in range(rng.randint(0, 9)))))
        k = rng.choice([2, 3])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        from csvplus_spark.operators.text import repeated_spans

        got = {(r["doc_id"], r["pos"], r["span"], r["n_docs"])
               for r in repeated_spans(df, k=k, min_docs=2).collect()}
        spans = {}
        occ = []
        for i, t in docs:
            toks = t.split() if t else []
            for p in range(len(toks) - k + 1):
                s = " ".join(toks[p:p + k])
                spans.setdefault(s, set()).add(i)
                occ.append((i, p, s))
        expect = {(i, p, s, len(spans[s])) for i, p, s in occ
                  if len(spans[s]) >= 2}
        assert got == expect


def test_remove_repeated_spans_matches_python_oracle(spark):
    """Random tiny-vocab corpora, k in {1,2,3}: removal output equals
    a brute-force Python reimplementation (coverage-union semantics)."""
    rng = random.Random(29)
    from csvplus_spark.operators.text import remove_repeated_spans

    for trial in range(3):
        docs = [(i, " ".join(rng.choice("abc")
                             for _ in range(rng.randint(0, 8))))
                for i in range(rng.randint(2, 10))]
        k = rng.choice([1, 2, 3])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["cleaned_text"]
               for r in remove_repeated_spans(df, k=k, min_docs=2).collect()}
        spans = {}
        for i, t in docs:
            toks = t.split() if t else []
            for p in range(len(toks) - k + 1):
                spans.setdefault(" ".join(toks[p:p + k]), set()).add(i)
        expect = {}
        for i, t in docs:
            toks = t.split() if t else []
            covered = set()
            for p in range(len(toks) - k + 1):
                if len(spans[" ".join(toks[p:p + k])]) >= 2:
                    covered.update(range(p, p + k))
            expect[i] = " ".join(tok for j, tok in enumerate(toks)
                                 if j not in covered)
        assert got == expect


def test_unigram_logprob_matches_python_oracle(spark):
    """Random corpora: (n_tokens, lp_mean) equals a Python MLE unigram
    model with position-ordered summation and round(6)."""
    import math

    from csvplus_spark.operators.text import unigram_logprob

    rng = random.Random(31)
    for trial in range(3):
        docs = [(i, " ".join(rng.choice("abcde")
                             for _ in range(rng.randint(0, 12))))
                for i in range(rng.randint(1, 12))]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["lp_mean"])
               for r in unigram_logprob(df).collect()}
        freq = {}
        total = 0
        for _, t in docs:
            for tok in (t.split() if t else []):
                freq[tok] = freq.get(tok, 0) + 1
                total += 1
        for i, t in docs:
            toks = t.split() if t else []
            if not toks:
                assert got[i] == (0, 0.0)
                continue
            s = 0.0
            for tok in toks:           # position order, left fold
                s += math.log(freq[tok] / total)
            assert got[i] == (len(toks), round(s / len(toks), 6)), i


def test_pngcodec_roundtrip_random_images():
    """Random geometry/content roundtrip for the pure-Python PNG codec:
    decode(encode(img)) == img for every channel count, including 1-px
    edges; resize_nearest preserves exact source pixels at mapped
    positions (pure Python, no Spark needed)."""
    from csvplus_spark.operators.pngcodec import (decode_png, encode_png,
                                                  resize_nearest)

    rng = random.Random(23)
    for _ in range(40):
        w = rng.randint(1, 24)
        h = rng.randint(1, 24)
        ch = rng.choice([1, 2, 3, 4])
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        blob = encode_png(w, h, ch, px)
        assert decode_png(blob) == (w, h, ch, px)

        nw, nh = rng.randint(1, 16), rng.randint(1, 16)
        out = resize_nearest(w, h, ch, px, nw, nh)
        assert len(out) == nw * nh * ch
        for _ in range(5):  # spot-check the nearest mapping
            x, y = rng.randrange(nw), rng.randrange(nh)
            sx, sy = (x * w) // nw, (y * h) // nh
            assert out[(y * nw + x) * ch:(y * nw + x + 1) * ch] == \
                px[(sy * w + sx) * ch:(sy * w + sx + 1) * ch]


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 65535), st.integers(1, 65535),
       st.integers(1, 4), st.booleans(),
       st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_jpeg_marker_walk_roundtrip(w, h, nc, prog, junk):
    """jpeg_info inverts encode_minimal_jpeg for every geometry, and
    stays correct with arbitrary APPn payloads injected before SOF."""
    import struct

    from csvplus_spark.operators.jpegcodec import is_jpeg, jpeg_info
    from csvplus_spark.operators.jpegcodec import encode_minimal_jpeg

    blob = encode_minimal_jpeg(w, h, nc, prog)
    assert is_jpeg(blob)
    assert jpeg_info(blob) == (w, h, nc, prog)
    # inject an APP7 segment carrying arbitrary bytes before the SOF
    app = b"\xff\xe7" + struct.pack(">H", len(junk) + 2) + junk
    assert jpeg_info(blob[:2] + app + blob[2:]) == (w, h, nc, prog)
