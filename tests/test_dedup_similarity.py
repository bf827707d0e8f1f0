"""Dedup family + similarity search: semantics vs brute-force oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "pack my box with five dozen liquor jugs before the night ends here",
        "sphinx of black quartz judge my vow while the world keeps spinning",
    ]
    rows = []
    i = 0
    for b in base:
        for _ in range(3):  # exact dups
            rows.append((i, b)); i += 1
        # near dup: one word changed
        rows.append((i, b.replace("the", "a", 1))); i += 1
    rows.append((i, "completely different text with no overlap whatsoever in words")); i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def brute_jaccard(a: str, b: str, k: int) -> float:
    def sh(s):
        w = s.lower().split()
        return {" ".join(w[j : j + k]) for j in range(max(len(w) - k + 1, 1))}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_exact_dedup_keeps_one_per_text(spark, docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    texts = [r.text for r in out.collect()]
    assert len(texts) == len(set(texts)) == 7  # 3 bases + 3 near + 1 unique
    # lowest id kept
    kept = {r.doc_id for r in out.collect()}
    assert {0, 4, 8} <= kept


def test_minhash_lsh_finds_dup_clusters(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=16, k_shingle=3, jaccard_threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # every exact-dup pair within a cluster must surface
    for base in (0, 4, 8):
        for a in range(base, base + 3):
            for b in range(a + 1, base + 3):
                assert (a, b) in got, (a, b)
    # the unrelated doc pairs with nothing
    assert not any(12 in p for p in got)


def test_minhash_estimates_track_true_jaccard(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=32, k_shingle=3, jaccard_threshold=0.3
    ).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in pairs:
        true_j = brute_jaccard(texts[r.id_a], texts[r.id_b], 3)
        assert abs(r.jaccard_est - true_j) < 0.35, (r.id_a, r.id_b, r.jaccard_est, true_j)


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert pairs
    for r in pairs:
        true_j = brute_jaccard(texts[r.id_a], texts[r.id_b], 3)
        assert abs(r.jaccard - true_j) < 1e-4  # operator rounds to 4 decimals


def test_benchmark_contamination(spark):
    """Decontamination (published n-gram-overlap method): a training doc
    copying a benchmark passage verbatim is flagged; clean docs score 0;
    partially-overlapping docs get the exact overlap fraction."""
    bench = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
        ],
        "bid long, text string",
    )
    train = spark.createDataFrame(
        [
            # verbatim copy of benchmark passage → fully contaminated
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # clean: disjoint vocabulary
            (11, "completely unrelated sentence about spark physical plans here"),
            # half-copied: first 10 words benchmark, then clean tail
            (12, "the quick brown fox jumps over the lazy dog tonight plus an original unrelated tail of words"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.benchmark_contamination(
            train, bench, n=5, min_overlap=0.5
        ).collect()
    }
    assert out[10].overlap == 1.0 and out[10].contaminated
    assert out[11].n_hit == 0 and not out[11].contaminated
    # doc 12: 17 words → 13 distinct 5-grams; the 6 grams fully inside the
    # copied 10-word prefix hit the benchmark set
    assert out[12].n_grams == 13 and out[12].n_hit == 6
    assert abs(out[12].overlap - 6 / 13) < 1e-9 and not out[12].contaminated


def test_line_dedup_boilerplate_removal(spark):
    """Line-level dedup: a cookie-banner line shared by 3 docs is removed
    everywhere; unique lines keep their original order; an all-boilerplate
    doc comes back empty instead of vanishing."""
    banner = "accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n{banner}\nbody text alpha"),
            (2, f"{banner}\nbody text beta\nclosing words"),
            (3, f"body text gamma\n{banner}"),
            (4, banner),  # nothing but boilerplate
            (5, "totally unique document"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.line_dedup(docs, max_line_df=2).collect()}
    assert out[1].text == "intro one\nbody text alpha"
    assert out[2].text == "body text beta\nclosing words"
    assert out[3].text == "body text gamma"
    assert out[4].text == "" and out[4].n_lines_kept == 0
    assert out[5].text == "totally unique document"


def test_canonicalize_url(spark):
    rows = [
        (1, "HTTP://Example.com:80/a/?utm_source=x&b=1&a=2#frag"),
        (2, "http://example.com/a?a=2&b=1"),
        (3, "https://Example.com:443/"),
        (4, "https://example.com"),
        (5, "https://site.io/p?gclid=123&keep=1&ref=tw"),
        # non-default scheme/port combos: these are DIFFERENT origins and
        # must NOT collapse onto the portless canonical form
        (6, "https://example.com:80/x"),
        (7, "http://example.com:443/x"),
        (8, "https://example.com:443/x"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r.id: r.canon
        for r in df.select(
            "id", dedup.canonicalize_url(F.col("url")).alias("canon")
        ).collect()
    }
    assert got[1] == got[2] == "http://example.com/a?a=2&b=1"
    assert got[3] == got[4] == "https://example.com/"
    # `ref` is content-bearing — kept unless the caller opts in via strip_params
    assert got[5] == "https://site.io/p?keep=1&ref=tw"
    assert got[6] == "https://example.com:80/x"
    assert got[7] == "http://example.com:443/x"
    assert got[8] == "https://example.com/x"
    stripped = df.filter(F.col("id") == 5).select(
        dedup.canonicalize_url(F.col("url"), strip_params=["ref"]).alias("c")
    ).head().c
    assert stripped == "https://site.io/p?keep=1"


def test_line_dedup_regex_metachar_separator(spark):
    """Separators with regex metacharacters split literally and round-trip
    (split takes a Java regex; the separator is escaped internally)."""
    shared = "boiler"
    docs = spark.createDataFrame(
        [(1, f"alpha|{shared}|omega"), (2, f"{shared}|beta"), (3, f"gamma|{shared}")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.line_dedup(docs, sep="|", max_line_df=2).collect()
    }
    assert out[1].text == "alpha|omega"
    assert out[2].text == "beta"
    assert out[3].text == "gamma"


def test_ngram_prefix_filter_is_exact(spark):
    """Prefix-filtered candidate generation (AllPairs/PPJoin) must return
    EXACTLY the brute-force pair set at every threshold — completeness is
    the point of the prefix + length filters, so this pins it on a seeded
    random corpus with planted near-duplicates and repeated vocabulary."""
    import itertools
    import random

    rng = random.Random(421)
    vocab = [f"w{i}" for i in range(40)]  # small vocab → heavy gram sharing
    rows = []
    for i in range(80):
        words = [rng.choice(vocab) for _ in range(rng.randint(6, 20))]
        rows.append((i, " ".join(words)))
        if i % 4 == 0:  # planted near-duplicate: one substitution
            mutated = list(words)
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    texts = dict(rows)

    for t in (0.3, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", n=3, threshold=t
            ).collect()
        }
        want = set()
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            a, b = min(ia, ib), max(ia, ib)
            j = brute_jaccard(texts[a], texts[b], 3)
            if j >= t:
                want.add((a, b))
        assert got == want, (t, want - got, got - want)


def test_simhash_identical_texts_same_hash(spark, docs):
    out = dedup.simhash(F.col("text"))
    rows = docs.select("doc_id", out.alias("h")).collect()
    h = {r.doc_id: r.h for r in rows}
    assert h[0] == h[1] == h[2]
    # near-dup differs in few bits
    diff = bin((h[0] ^ h[3]) & ((1 << 64) - 1)).count("1")
    assert diff <= 16
    far = bin((h[0] ^ h[12]) & ((1 << 64) - 1)).count("1")
    assert far > diff


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-duplicate of each: tiny noise
        rows.append((100 + i, [float(x) for x in v + rng.standard_normal(16) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0).first().embedding
    top = similarity.brute_force_topk(vectors, list(q), k=2).collect()
    assert top[0].vec_id == 0 and abs(top[0].cos_sim - 1.0) < 1e-9
    assert top[1].vec_id == 100  # its near-duplicate


def test_lsh_topk_finds_near_neighbor(spark, vectors):
    q = list(vectors.filter(F.col("vec_id") == 0).first().embedding)
    top = similarity.lsh_topk(vectors, q, k=2, bits=12, bands=4).collect()
    ids = [r.vec_id for r in top]
    assert 0 in ids and 100 in ids


def test_ivf_topk_recall_and_exactness_at_full_probe(spark, vectors):
    """IVF coarse-quantizer probe: high recall at n_probe<k_centroids, and
    EXACT (= brute force) when probing every list."""
    q = list(vectors.filter(F.col("vec_id") == 0).first().embedding)
    exact = [r.vec_id for r in similarity.brute_force_topk(vectors, q, k=5).collect()]
    cent = similarity.train_ivf_centroids(vectors, k=8, seed=7)
    # full probe == exact
    full = [
        r.vec_id
        for r in similarity.ivf_topk(
            vectors, q, k=5, n_centroids=8, n_probe=8, centroids=cent
        ).collect()
    ]
    assert full == exact
    # partial probe finds the query vector and its planted near-duplicate
    part = [
        r.vec_id
        for r in similarity.ivf_topk(
            vectors, q, k=5, n_centroids=8, n_probe=2, centroids=cent
        ).collect()
    ]
    assert 0 in part and 100 in part
    # deterministic: seeded training reproduces the same centroids
    cent2 = similarity.train_ivf_centroids(vectors, k=8, seed=7)
    import numpy as np

    assert np.allclose(cent, cent2)


def test_all_pairs_above_finds_duplicate_pairs(spark, vectors):
    pairs = similarity.all_pairs_above(vectors, threshold=0.99, bits=16, bands=8).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    hits = sum((i, 100 + i) in got for i in range(20))
    assert hits >= 16  # high recall on 0.9999-sim pairs
    for r in pairs:
        assert r.cos_sim >= 0.99


def test_multimodal_plumbing(spark):
    from opentelemetry_collector_contrib_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, 30)
    feats = mm.extract_features(media).collect()
    assert len(feats) == 30 and all(len(r.features) == 8 for r in feats)
    # deterministic: same payload → same features
    again = {r.doc_id: r.features for r in mm.extract_features(media).collect()}
    for r in feats:
        assert again[r.doc_id] == r.features
    frames = mm.sample_video_frames(media, every_ms=1000)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)  # 3000ms / 1000ms
    resized = mm.resize_images(media, 32, 32).collect()
    assert all(r.meta.width == 32 for r in resized)


def test_multimodal_real_codecs(spark):
    """BMP/WAV are REAL codecs: pixel dims and sample stats come from the
    bytes, not the meta; resize re-encodes a decodable BMP at the new dims."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.operators import multimodal as mm

    # round-trip: encode → decode reproduces exact pixels / samples
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, back = mm.decode_bmp(mm.encode_bmp(px))
    assert (w, h) == (9, 5) and np.array_equal(back, px)
    samples = rng.integers(-30000, 30000, size=777, dtype=np.int16)
    ch, rate, sback = mm.decode_wav(mm.encode_wav(samples, rate=16000))
    assert (ch, rate) == (1, 16000) and np.array_equal(sback, samples)

    media = mm.synthetic_media(spark, 30)
    feats = {r.doc_id: r for r in mm.extract_features(media).collect()}
    imgs = {r.doc_id: r for r in media.collect()}
    for doc_id, r in feats.items():
        src = imgs[doc_id]
        if src.media_type == "image":
            # features[0:2] are the REAL decoded width/height from the bytes
            assert r.features[0] == 16.0 and r.features[1] == 12.0
        elif src.media_type == "audio":
            assert r.features[0] == 2000.0 and r.features[1] == 8000.0

    resized = mm.resize_images(media.filter("media_type = 'image'"), 4, 6).collect()
    from opentelemetry_collector_contrib_spark.functions.jpegcodec import decode_jpeg

    for r in resized:
        raw = bytes(r.payload)
        dec = mm.decode_bmp if raw[:2] == b"BM" else decode_jpeg
        w2, h2, px2 = dec(raw)
        assert (w2, h2) == (4, 6) and px2.shape == (6, 4, 3)
        if raw[:2] != b"BM":
            continue  # JPEG is lossy: exact pixel membership only holds for BMP
        # nearest-neighbor: every resized pixel exists in the source image
        w0, h0, px0 = mm.decode_bmp(bytes(imgs[r.doc_id].payload))
        src_set = {tuple(q) for q in px0.reshape(-1, 3)}
        assert all(tuple(q) in src_set for q in px2.reshape(-1, 3))


def test_canonicalize_url_idempotent(spark):
    """canon(canon(x)) == canon(x) over a generated URL corpus — the
    canonical form must be a fixed point (otherwise dedup keys drift)."""
    import itertools

    schemes = ["http", "HTTPS"]
    hosts = ["Example.com", "site.io:443", "a.b.c:80"]
    paths = ["", "/", "/x/y/", "/x"]
    queries = ["", "?b=2&a=1", "?utm_source=z&k=1", "?gclid=9"]
    frags = ["", "#frag"]
    urls = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = dedup.canonicalize_url(F.col("url"))
    out = df.select(
        once.alias("c1"),
        dedup.canonicalize_url(once).alias("c2"),
    ).collect()
    for r in out:
        assert r.c1 == r.c2, r


def test_line_dedup_roundtrip_property(spark):
    """Property: with a document-frequency cap no line can exceed, line_dedup
    is the identity on text — for random corpora and regex-metachar
    separators (the split is escaped; concat_ws rebuilds literally)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    seps = ["\n", "|", ".", "\r\n", "||", "@@"]
    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2"]

    @settings(max_examples=12, deadline=None)
    @given(
        sep=st.sampled_from(seps),
        n_docs=st.integers(min_value=1, max_value=6),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def check(sep, n_docs, seed):
        r = random.Random(seed)
        docs = []
        for i in range(n_docs):
            lines = [
                " ".join(r.choices(vocab, k=r.randint(1, 4)))
                for _ in range(r.randint(1, 5))
            ]
            docs.append((i, sep.join(lines)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r2.doc_id: r2.text
            for r2 in dedup.line_dedup(
                df, sep=sep, max_line_df=len(docs) + 1
            ).collect()
        }
        assert out == dict(docs)

    check()


def test_png_codec_roundtrip_and_filters(spark):
    """PNG: encode→decode roundtrip; decode handles ALL five scanline
    filters (None/Sub/Up/Average/Paeth), grayscale broadcast and RGBA
    alpha-drop — the full non-interlaced 8-bit baseline."""
    import struct
    import zlib

    import numpy as np

    from opentelemetry_collector_contrib_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    w, h, out = decode_png(encode_png(px))
    assert (w, h) == (9, 13) and (out == px).all()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    H, W, CH = 5, 4, 3
    img = rng.integers(0, 256, (H, W, CH), dtype=np.uint8)
    rows, prev = [], np.zeros(W * CH, dtype=np.uint8)
    for r in range(H):
        line = img[r].reshape(-1)
        ft = r % 5
        f = line.copy()
        for x in range(W * CH - 1, -1, -1):
            a = int(line[x - CH]) if x >= CH else 0
            b = int(prev[x])
            c = int(prev[x - CH]) if x >= CH else 0
            if ft == 1:
                f[x] = (int(line[x]) - a) & 0xFF
            elif ft == 2:
                f[x] = (int(line[x]) - b) & 0xFF
            elif ft == 3:
                f[x] = (int(line[x]) - (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[x] = (int(line[x]) - pred) & 0xFF
        rows.append(bytes([ft]) + f.tobytes())
        prev = line
    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    _, _, out2 = decode_png(payload)
    assert (out2 == img).all()

    gray = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
    graw = b"".join(b"\x00" + gray[r].tobytes() for r in range(6))
    gp = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(graw))
        + chunk(b"IEND", b"")
    )
    _, _, out3 = decode_png(gp)
    assert out3.shape == (6, 7, 3) and (out3[:, :, 0] == gray[:, :, 0]).all()


def test_png_through_spark_plumbing(spark):
    """A planted PNG flows through the real feature-extract and resize
    stages end-to-end (magic-byte sniff picks the real decoder)."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.operators import multimodal
    from opentelemetry_collector_contrib_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.zeros((10, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    rows = [("img1", "image", bytearray(encode_png(px)), {"width": 8, "height": 10,
             "duration_ms": None, "codec": "png"})]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(df).collect()[0]
    f = list(feats.features)
    assert f[0] == 8.0 and f[1] == 10.0
    assert abs(f[2] - 1.0) < 1e-9 and f[3] == 0.0 and f[4] == 0.0  # R=1, G=B=0

    small = multimodal.resize_images(df, 4, 5).collect()[0]
    w, h, out = decode_png(bytes(small.payload))
    assert (w, h) == (4, 5) and (out[:, :, 0] == 255).all() and (out[:, :, 1] == 0).all()


def test_jpeg_codec_roundtrip_and_features(spark):
    """Baseline JPEG (functions/jpegcodec.py, ITU-T T.81): encode→decode
    roundtrip within lossy tolerance, exact on flat blocks; decoder rejects
    progressive streams; a planted JPEG flows through the real
    feature-extract and resize stages (magic-byte sniff)."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )
    from opentelemetry_collector_contrib_spark.operators import multimodal

    # smooth content roundtrip: small mean error at q=90
    yy, xx = np.mgrid[0:24, 0:33]
    img = np.stack([(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256],
                   axis=-1).astype(np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img, quality=90))
    assert (w, h) == (33, 24)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0

    # flat 8x8-aligned content is exact (DC-only blocks quantize losslessly)
    flat = np.full((16, 16, 3), 130, np.uint8)
    _w, _h, fout = decode_jpeg(encode_jpeg(flat, quality=95))
    assert (fout == 130).all()

    # progressive (SOF2) is rejected, not mis-decoded
    data = bytearray(encode_jpeg(flat))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))

    # through the Spark plumbing: real dims + channel stats from the bytes
    px = np.zeros((10, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 255
    rows = [("j1", "image", bytearray(encode_jpeg(px, 95)),
             {"width": 8, "height": 10, "duration_ms": None, "codec": "jpeg"})]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    f = list(multimodal.extract_features(df).collect()[0].features)
    assert f[0] == 8.0 and f[1] == 10.0
    assert f[2] > 0.9 and f[3] < 0.15 and f[4] < 0.15  # red-dominant

    small = multimodal.resize_images(df, 4, 5).collect()[0]
    w2, h2, out2 = decode_jpeg(bytes(small.payload))
    assert (w2, h2) == (4, 5)
    assert out2[:, :, 0].mean() > 200 and out2[:, :, 1].mean() < 60


def test_portable_features_udf_matches_column_path(spark):
    """The flat-vectorized words→(sig, sh) Arrow pass must be bit-identical
    to the Column/HOF formulation the DuckDB oracle pins — including short
    (<k words) rows, empty strings, and repeated-shingle docs."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "tiny doc"),          # shorter than k: one truncated window
        (4, "one"),               # single word
        (5, ""),                  # splits to [""]
        (6, "a a a a a a a a a"),  # every shingle identical
        (7, None),                # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = F.split(F.lower(F.col("text")), r"\s+")
    fast = (
        df.select(F.col("doc_id").alias("id"), words.alias("_w"))
        .withColumn("_ss", dedup.portable_minhash_features_udf(k=5, num_hashes=16)(F.col("_w")))
        .select("id", F.col("_ss.sig").alias("sig"), F.col("_ss.sh").alias("sh"))
    )
    feats = dedup.shingle_hash_frame(
        df, "text", "doc_id", 5, hash_fn="portable", keep_word_hashes=True
    )
    slow = feats.select(
        "id",
        dedup.minhash_signature_from_hashes(F.col("hs"), 16, hash_fn="portable").alias("sig"),
        dedup.simhash_from_hashes(F.col("wh"), bits=40).alias("sh"),
    )
    a = {r.id: (list(r.sig) if r.sig is not None else None, r.sh) for r in fast.collect()}
    b = {r.id: (list(r.sig) if r.sig is not None else None, r.sh) for r in slow.collect()}
    # null words row: the Column path yields null sig/sh as well
    assert a == b
