#!/usr/bin/env python3
"""Pathological-corpus parity sweep: replace the documents table with
adversarial edge cases (empty text, whitespace runs, multibyte unicode,
giant tokens/docs, control chars, regex metachars, planted dups) and run
the FULL oracle gate on it. Anything that hash-mismatches here is a
cross-engine seam the benign driver testdata cannot surface.

Usage: python3 tools/patho_check.py [base_sf_dir]   (default sf0.001)

Nothing is skipped: the former byte-slicing stubs (m2/m3/m6) are real
PNG-pixel ops as of round 11, gated in the local surface against pure-
Python references that are text-independent — every declared query runs
on every pathological corpus.
"""
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

# first NON-FLAG positional is the base sf dir (a leading flag like
# --vocab-dry must not be eaten as the path — it silently dropped every
# base table from the crafted corpus)
_pos = [a for i, a in enumerate(sys.argv[1:])
        if not a.startswith("--") and not (i > 0 and sys.argv[i] == "--seed")]
BASE = _pos[0] if _pos else "/root/testdata/sf0.001"
SKIP = set()
# --seed N swaps the hand-crafted documents for a seeded RANDOM corpus
# (mixed-script alphabet, 0-200-token docs, planted dup pairs) — the
# probabilistic complement to the crafted edge cases.
RANDOM_SEED = None
if "--seed" in sys.argv:
    RANDOM_SEED = int(sys.argv[sys.argv.index("--seed") + 1])
# --vocab-dry swaps in a corpus whose BPE training DRIES before the gated
# K=8 merges (tiny vocabulary: single-letter words + one two-letter word
# type): the engine stops at the realized merge count, and the t37 oracle's
# state chain must carry through the empty m$i CTEs instead of emptying
# (ADVICE r11 — the old cross join returned 0 rows here).
VOCAB_DRY = "--vocab-dry" in sys.argv


def build_random_corpus(out_dir: Path, seed: int) -> None:
    import random
    import pyarrow as pa
    import pyarrow.parquet as pq
    rnd = random.Random(seed)
    alphabet = (["the", "of", "and", "in", "to", "a"] +
                [f"w{i}" for i in range(50)] +
                ["智能", "数据", "café", "🚀", "x" * 30, "1", "-", "@", "%s"])
    docs = []
    for i in range(120):
        n = rnd.choice([0, 1, 2, rnd.randint(3, 200)])
        docs.append((i, " ".join(rnd.choice(alphabet) for _ in range(n)),
                     rnd.choice(["en", "fr", "es", "de", "zh"]),
                     f"src{rnd.randint(0, 4)}"))
    for i in range(120, 130):                 # planted exact dups
        docs.append((i, docs[i - 120][1], docs[i - 120][2], docs[i - 120][3]))
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(tbl, out_dir / "documents.parquet")


def build_vocab_dry_corpus(out_dir: Path) -> None:
    """BPE-degenerate corpus: the only multi-letter word TYPE is 'ab', so
    training realizes exactly one merge (a b) and then dries — 7 short of
    the gated K=8. Enough docs/variety that the rest of the doc-op surface
    still exercises real code paths (dups, sources, langs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = []

    def add(i, text, lang="en", source="srcV"):
        docs.append((i, text, lang, source, len(text)))

    add(0, "ab ab ab a b c")
    add(1, "a b c d e f g")
    add(2, "ab a ab b ab c")
    add(3, "")                                    # empty
    add(4, "a a a a a a a a a a")
    add(5, "1 2 3 4 5 - @ %")                     # no [a-z]{2,} at all
    add(6, "ab ab ab a b c")                      # exact dup of 0
    for i in range(7, 24):                        # volume, still vocab-dry
        add(i, " ".join(["ab", "a", "b", "c"][j % 4] for j in range(i)),
            ["en", "de", "es"][i % 3], f"src{i % 2}")
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(tbl, out_dir / "documents.parquet")


def build_corpus(out_dir: Path) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = []

    def add(i, text, lang="en", source="srcP"):
        docs.append((i, text, lang, source, len(text)))

    add(0, "")                                     # empty text
    add(1, "solo")                                 # single token
    add(2, "   ")                                  # only spaces -> empty tokens
    add(3, "a  b   c")                             # repeated separators
    add(4, ("tok " * 5000).strip())                # 5000-token repeat
    add(5, "智能 数据 处理 引擎 规模 测试", "zh")   # CJK (3-byte utf-8)
    add(6, "café naïve résumé coöperate Ĳsselmeer", "fr")
    add(7, "🚀 emoji 🌍 tokens 🎉 here")            # 4-byte utf-8
    add(8, "reach me at alice@example.com or 555-123-4567 thanks")
    add(9, "the quick brown fox jumps over the lazy dog in winter")
    add(10, "the quick brown fox jumps over the lazy dog in winter")  # exact dup
    add(11, "the quick brown fox jumps over the lazy dog in summer")  # near dup
    add(12, "x" * 40000)                           # one giant token
    add(13, "line\nbreak and\ttab inside")         # control chars
    add(14, "UPPER lower MiXeD case TOKENS upper LOWER")
    add(15, "0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19")
    add(16, "' \" ; -- drop ( ) [ ] { } % _ \\ | & * ? + . ^ $")
    add(17, ("alpha beta gamma " * 40).strip(), "de")
    add(18, "ein zwei drei vier fünf sechs sieben acht neun zehn", "de")
    add(19, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es")
    for i in range(20, 40):                        # volume for sampling ops
        add(i, f"filler doc {i} with the common words of and in to a plus word{i}",
            ["en", "fr", "es", "de", "zh"][i % 5], f"src{i % 3}")
    # x10 regime flip: the KMV sketch (k=256) has two estimator regimes —
    # a side whose distinct shingle count stays UNDER k absorbs the whole
    # set (exact n), a side over k estimates (k-1)/theta. The docs below
    # force the split: every EVEN id carries the SAME duplicate-heavy text
    # (one shingle set, added once — the even side stays absorbed no
    # matter how many copies), while each ODD id contributes ~30 unique
    # shingles so the odd side crosses k and must estimate. Both regimes
    # then live in one x10 answer and the shared-theta set algebra is
    # exercised across them.
    dup_text = "dup heavy corpus doc repeated verbatim for the even side of the sketch"
    for i in range(40, 70):
        if i % 2 == 0:
            add(i, dup_text, "en", "srcDup")
        else:
            uniq = " ".join(f"u{i}t{j}" for j in range(32))
            add(i, uniq, "en", "srcUniq")
    # d19/d21 skew adversary (VERDICT r10 #9): ONE 40-gram ('z'*40) occurs
    # ~5e4 times in EACH of two docs — a single hot gram key of ~1e5 rows
    # through the cross-doc partial agg and the hit semi-join, and both
    # docs must come back 100% duplicated (every position a hit, one
    # island, dup_chars = full length). AqeSkewSpec pins the task-time
    # spread on the same shape.
    add(70, "z" * 50000)
    add(71, "z" * 50000)
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(tbl, out_dir / "documents.parquet")


def build_events(out_dir: Path) -> None:
    """Adversarial events: tie-break storms (identical microseconds),
    session-gap EQUALITY (exactly 30:00 apart — strict-> rule), join-window
    boundary hits (purchase at exactly click + 2 days, and 1 us past),
    purchase-before-click, exact hour-boundary timestamps, value extremes,
    and every props shape e3/e16 could meet (null, {}, missing k, k:null,
    k as string, malformed, non-integer k, k past 2^63), plus a
    sub-millisecond max event time probing the stream-stream watermark's
    ms truncation."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    US = 1_000_000
    BASE = 1_704_067_200 * US            # 2024-01-01 00:00:00 UTC in us
    ev = []

    def add(eid, ts_us, user, typ, value, props='{"k": 1}'):
        ev.append((eid, ts_us, user, typ, value, props))

    eid = 0
    # u1: ten events at the SAME microsecond — every ordering tie-break fires
    for i in range(10):
        add(eid, BASE + 3600 * US, 1, ["view", "click", "purchase"][i % 3],
            1.25, '{"k": %d}' % i); eid += 1
    # u2: chain at EXACTLY 30-minute gaps (the > rule keeps one session)
    for i in range(5):
        add(eid, BASE + i * 1800 * US, 2, "view", 2.00); eid += 1
    # u2 again after exactly 30:00.000001 (one us past the gap -> new session)
    add(eid, BASE + 4 * 1800 * US + 1800 * US + 1, 2, "view", 2.00); eid += 1
    # u3: click; purchase at exactly +2 days (inclusive bound); +2d+1us (out)
    add(eid, BASE, 3, "click", 3.00); eid += 1
    add(eid, BASE + 2 * 86400 * US, 3, "purchase", 3.50); eid += 1
    add(eid, BASE + 2 * 86400 * US + 1, 3, "purchase", 3.75); eid += 1
    add(eid, BASE, 3, "purchase", 3.99); eid += 1   # gap 0: same-instant match
    # u4: one-hour burst with value extremes (decimal(18,2)-exact inputs)
    for i in range(50):
        add(eid, BASE + 7 * 86400 * US + i * 60 * US, 4, "view",
            [0.00, -185.22, 12345678.99, 0.01][i % 4],
            [None, "{}", '{"k": null}', '{"k": "9"}', "not json",
             '{"k": 1.5}', '{"k": "abc"}',
             '{"k": 9223372036854775813}'][i % 8])
        eid += 1
    # u5: a single event, far enough in the past to watermark-finalize
    add(eid, BASE + 60 * US, 5, "click", 5.00, None); eid += 1
    # u6: strict funnel with duplicated stages
    for i, t in enumerate(["view", "view", "click", "purchase", "purchase"]):
        add(eid, BASE + 3 * 86400 * US + i * 60 * US, 6, t, 6.00); eid += 1
    # u7: purchase BEFORE its click — must never attribute
    add(eid, BASE + 5 * 86400 * US, 7, "purchase", 7.00); eid += 1
    add(eid, BASE + 5 * 86400 * US + 3600 * US, 7, "click", 7.50); eid += 1
    # u8: exact hour boundaries (window-assignment edges)
    for i in range(4):
        add(eid, BASE + 10 * 86400 * US + i * 3600 * US, 8, "view", 8.00); eid += 1
    # u9..u15: one event each, mixed types incl. non-funnel ones; late tail
    for u in range(9, 16):
        add(eid, BASE + (u + 5) * 86400 * US, u,
            ["signup", "error", "view", "click"][u % 4], float(u)); eid += 1
    # u16/u17: watermark ms-truncation band — the purchase-side max ts
    # carries 500 us of sub-millisecond time, so a us-precise oracle
    # watermark would sit 500 us ahead of Spark's ms-truncated one; the
    # u16 click's finalization instant (cts + 2 d, at +100 us) lands
    # INSIDE that band, so it must stay buffered (engine rule), not
    # null-emit (the us-precise rule a naive oracle would state).
    add(eid, BASE + 16 * 86400 * US + 100, 16, "click", 16.00); eid += 1
    add(eid, BASE + 21 * 86400 * US + 500, 16, "purchase", 16.50); eid += 1
    add(eid, BASE + 25 * 86400 * US, 17, "click", 17.00); eid += 1
    tbl = pa.table({
        "event_id": pa.array([e[0] for e in ev], pa.int64()),
        "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
        "user_id": pa.array([e[2] for e in ev], pa.int64()),
        "event_type": pa.array([e[3] for e in ev], pa.string()),
        "value": pa.array([e[4] for e in ev], pa.float64()),
        "props": pa.array([e[5] for e in ev], pa.string()),
    })
    pq.write_table(tbl, out_dir / "events.parquet")


def build_embeddings(out_dir: Path) -> None:
    """Adversarial embeddings: exact duplicates (dedup paths + cosine
    TIES), a 0.999999-cosine perturbation, a sign-flipped vector
    (cosine -1), tiny magnitudes (amax/int8 clamp), one dominant axis,
    all-equal components, and large magnitudes. Zero vectors are
    deliberately absent: cosine is undefined there, out of the
    embedding-column contract. vec_id < 32 stay generic — they are the
    fixed seed quantizer every s-query broadcasts."""
    import random
    import pyarrow as pa
    import pyarrow.parquet as pq
    rnd = random.Random(17)
    vecs = {}
    for i in range(32):                      # the seed-centroid range
        vecs[i] = [rnd.uniform(-1, 1) for _ in range(64)]
    for i in range(4):                       # exact duplicates of 0..3
        vecs[32 + i] = list(vecs[i])
    v4 = list(vecs[4]); v4[0] += 1e-4        # ~0.999999-cosine near-dup
    vecs[36] = v4
    vecs[37] = [-x for x in vecs[5]]         # sign flip: cosine exactly -1
    vecs[38] = [x * 1e-8 for x in vecs[6]]   # tiny magnitude
    vecs[39] = [0.0] * 63 + [1.0]            # single dominant axis
    vecs[40] = [0.5] * 64                    # all-equal components
    vecs[41] = [x * 1e10 for x in vecs[7]]   # large magnitude
    for i in range(42, 60):                  # volume
        vecs[i] = [rnd.uniform(-1, 1) for _ in range(64)]
    ids = sorted(vecs)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids], pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in ids], pa.int32()),
    })
    pq.write_table(tbl, out_dir / "embeddings.parquet")


def main() -> int:
    work = Path(tempfile.mkdtemp(prefix="graft_patho_"))
    sf = work / "sf"
    out = work / "verify"
    sf.mkdir()
    for p in Path(BASE).glob("*.parquet"):
        shutil.copy(p, sf / p.name)
    if RANDOM_SEED is not None:
        build_random_corpus(sf, RANDOM_SEED)
    elif VOCAB_DRY:
        build_vocab_dry_corpus(sf)
    else:
        build_corpus(sf)
    build_events(sf)
    build_embeddings(sf)
    print(f"[patho] corpus at {sf}"
          + (f" (random seed {RANDOM_SEED})" if RANDOM_SEED is not None else "")
          + (" (vocab-dry)" if VOCAB_DRY else ""))
    if VOCAB_DRY:
        # the corpus must really dry the training before K=8: exactly one
        # multi-letter word type ('ab') -> one realizable merge
        import duckdb
        n_types = duckdb.connect().execute(f"""
            SELECT COUNT(DISTINCT w) FROM (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM '{sf}/documents.parquet')
            WHERE regexp_matches(w, '^[a-z]{{2,}}$') AND len(w) > 1""").fetchone()[0]
        assert n_types == 1, f"vocab-dry corpus lost its shape: {n_types} word types"
    if RANDOM_SEED is None and not VOCAB_DRY:
        # the crafted corpus must really split x10's estimator regimes:
        # even parity absorbed (distinct shingles < k), odd estimating
        import duckdb
        k = 256
        sides = dict(duckdb.connect().execute(f"""
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws
                        FROM '{sf}/documents.parquet'),
            sh AS (SELECT doc_id % 2 AS side, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
                   FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM ws))
            SELECT side, COUNT(DISTINCT sh) FROM sh GROUP BY side""").fetchall())
        assert sides.get(0, 0) < k < sides.get(1, 0), (
            f"x10 regime split lost: distinct shingles per side {sides}, k={k}")
        print(f"[patho] x10 regimes split: even(absorbed)={sides.get(0)} "
              f"< k={k} < odd(estimating)={sides.get(1)}")
    # PATHO_RUNNER=lockfree drives Verify through tools/run_main.sh (raw
    # classpath, no sbt lock) so several sweep modes can run CONCURRENTLY;
    # the default stays sbt (always-compiled classes). With the lock-free
    # runner YOU are responsible for `sbt package`/compile being current.
    import os
    if os.environ.get("PATHO_RUNNER") == "lockfree":
        cmd = ["tools/run_main.sh", "graft.Verify", str(sf), str(out)]
    else:
        cmd = ["sbt", "-batch", f"runMain graft.Verify {sf} {out}"]
    v = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if v.returncode != 0:
        print(f"[patho] verify failed to run (rc={v.returncode}); output tails:")
        print("---- stdout ----\n" + v.stdout[-4000:])
        print("---- stderr ----\n" + v.stderr[-4000:])
        return 2
    # drop the byte-slicing stubs from the compare
    for q in SKIP:
        d = out / q
        if d.exists():
            shutil.rmtree(d)
    r = subprocess.run(
        [sys.executable, "tools/oracle_check.py", str(out), str(sf)],
        cwd="/root/repo", capture_output=True, text=True)
    print(r.stdout[-4000:])
    if r.returncode != 0 and r.stderr:
        print("---- oracle_check stderr ----\n" + r.stderr[-2000:])
    # oracle_check exits 0 iff every compared query passed — the exit
    # code is the machine-readable status (no substring parsing); the
    # summary-line presence guards against an empty/aborted compare
    ok = r.returncode == 0 and any(
        ln.startswith("== ") for ln in r.stdout.splitlines())
    print(f"[patho] {'CLEAN' if ok else 'SEAMS FOUND'} "
          f"(skipped by documented contract: {sorted(SKIP)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
