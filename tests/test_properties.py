"""Property-based tests (hypothesis): the exactness scheme, the
formatter's total robustness, and the SQL safety gate under adversarial
inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_duckdb_spark.executor import UnsafeSqlError, clean_sql_response
from ai_duckdb_spark.formatter import _format_cell, format_analysis_result

# ---------------------------------------------------------------------------
# exact.py invariant: floor(x*10^s + 0.5) recovers the integer cents of any
# 2-decimal value stored as a double — the per-row step the whole
# cross-engine exactness scheme rests on.
# ---------------------------------------------------------------------------


@given(st.integers(min_value=-(10**15), max_value=10**15))
@settings(max_examples=500)
def test_floor_cents_recovers_2dec_values(cents: int) -> None:
    stored = cents / 100  # the double a 2-decimal value becomes
    assert math.floor(stored * 100 + 0.5) == cents


@given(st.integers(min_value=-(10**13), max_value=10**13))
@settings(max_examples=500)
def test_floor_cents_recovers_4dec_values(units: int) -> None:
    stored = units / 10_000
    assert math.floor(stored * 10_000 + 0.5) == units


@given(st.integers(min_value=2**53, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_oracle_varchar_roundtrip_correctly_rounded_above_2p53(units: int) -> None:
    """The r10 oracle mirror above 2^53 (sf1.0 rehearsal finding):
    DuckDB's direct DECIMAL→DOUBLE cast drifts 1 ulp once the scaled
    integer exceeds 2^53, while the VARCHAR round-trip sum_sql now
    emits is correctly rounded — pin it against Python's Fraction
    (exact) for the scale-6 domain q1's sum_charge lives in."""
    from fractions import Fraction

    import duckdb

    true_double = float(Fraction(units, 10**6))
    # build the scale-6 decimal LITERALLY (dividing in DuckDB SQL would
    # itself go through DOUBLE — DuckDB decimal division returns double)
    txt = f"{units // 10**6}.{units % 10**6:06d}"
    got = duckdb.sql(
        f"SELECT CAST(CAST(CAST('{txt}' AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    assert got == true_double


def test_spark_decimal_to_double_correctly_rounded_above_2p53(spark) -> None:
    """The Spark side of the same invariant: _finish's decimal division
    + double cast must be the correctly-rounded double (it was the
    CORRECT side in the sf1.0 q1 investigation — this pins it)."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from ai_duckdb_spark.functions.exact import _finish

    cases = [45368708049539773, 2**53 + 1, 2**60 + 7, 9007199254740993]
    df = spark.createDataFrame([(c,) for c in cases], "v long").select(
        F.col("v"), _finish(F.col("v"), 6).alias("d")
    )
    for row in df.collect():
        assert row.d == float(Fraction(row.v, 10**6)), row.v


# ---------------------------------------------------------------------------
# formatter: never crashes, always honors the cell contract
# ---------------------------------------------------------------------------

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=120),
)


@given(_cell)
@settings(max_examples=300)
def test_format_cell_contract(value) -> None:
    out = _format_cell(value)
    assert isinstance(out, str)
    if value is None:
        assert out == "null"
    elif isinstance(value, str):
        # the 50-char truncation applies to strings ONLY (reference
        # app.py:96-99); numeric cells format at full width
        assert len(out) <= 50
        if len(value) > 50:
            assert out.endswith("...")
    elif isinstance(value, float) and not isinstance(value, bool):
        assert out.endswith(tuple("0123456789")) and "." in out


@given(
    st.lists(
        st.dictionaries(st.sampled_from(["a", "b"]), _cell, min_size=2, max_size=2),
        max_size=15,
    )
)
@settings(max_examples=100)
def test_formatter_never_crashes(rows) -> None:
    result = {
        "question": "q",
        "sql_query": "SELECT 1",
        "data_info": {"行数": len(rows), "列数": 2, "列名": ["a", "b"]},
        "result": {"columns": ["a", "b"], "data": rows, "row_count": len(rows)},
    }
    md = format_analysis_result(result)
    assert "数据分析结果" in md


# ---------------------------------------------------------------------------
# safety gate: forbidden statements stay forbidden under noise —
# whitespace/fence/case mangling must never smuggle a write through the
# first-token gate.
# ---------------------------------------------------------------------------

_write_stmt = st.sampled_from(
    [
        "DROP TABLE data_table",
        "delete from data_table",
        "Insert into data_table values (1)",
        "UPDATE data_table SET x=1",
        "create table evil as select 1",
        "TRUNCATE TABLE data_table",
        "MERGE INTO data_table USING x ON true WHEN MATCHED THEN DELETE",
    ]
)
_noise = st.text(alphabet=" \t\n", max_size=5)


@given(_write_stmt, _noise, _noise, st.booleans())
@settings(max_examples=200)
def test_gate_blocks_mangled_writes(stmt, pre, post, fence) -> None:
    import pytest

    from ai_duckdb_spark.executor import ensure_select_only

    sql = f"{pre}{stmt}{post}"
    if fence:
        sql = f"```sql\n{sql}\n```"
    cleaned = clean_sql_response(sql)
    # the first-token allowlist must reject BEFORE any parser involvement,
    # so no SparkSession is needed (passing None proves the ordering)
    with pytest.raises(UnsafeSqlError):
        ensure_select_only(None, cleaned)


# ---------------------------------------------------------------------------
# BIFF8 .xls round trip: arbitrary flat tables written with the
# spec-derived fixture writer must come back identical through the
# stdlib reader (sources/xls.py) — in both CFB container placements.
# ---------------------------------------------------------------------------
_cellvalue = st.one_of(
    st.integers(min_value=-(2**29), max_value=2**29 - 1),  # RK int range
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=20,
    ),
    st.booleans(),
)


@given(
    rows=st.lists(st.lists(_cellvalue, min_size=1, max_size=5), min_size=1, max_size=8),
    mini=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_xls_roundtrip_property(rows, mini, tmp_path_factory) -> None:
    import struct as s

    from ai_duckdb_spark.sources.xls import read_xls_stdlib
    from tests.test_app_layer import _bof_payload, _make_cfb, _rec

    width = max(len(r) for r in rows)
    header = [f"col{i}" for i in range(width)]

    def cell(r, c, v):
        if isinstance(v, bool):
            return _rec(0x0205, s.pack("<HHHBB", r, c, 0, int(v), 0))
        if isinstance(v, str):
            return _rec(0x0204, s.pack("<HHHHB", r, c, 0, len(v), 0) + v.encode("latin-1"))
        # ints and floats both as NUMBER records (IEEE double)
        return _rec(0x0203, s.pack("<HHHd", r, c, 0, float(v)))

    cells = b"".join(cell(0, i, h) for i, h in enumerate(header))
    for ri, row in enumerate(rows, start=1):
        cells += b"".join(cell(ri, ci, v) for ci, v in enumerate(row))

    globals_core = _rec(0x0809, _bof_payload(0x0005))
    bs_stub = s.pack("<IHBB", 0, 0, 2, 0) + b"S1"
    globals_len = len(globals_core) + len(_rec(0x0085, bs_stub)) + len(_rec(0x000A, b""))
    bs = s.pack("<IHBB", globals_len, 0, 2, 0) + b"S1"
    sheet = _rec(0x0809, _bof_payload(0x0010)) + cells + _rec(0x000A, b"")
    wb = globals_core + _rec(0x0085, bs) + _rec(0x000A, b"") + sheet
    if not mini and len(wb) < 4096:
        wb += b"\x00" * (4096 - len(wb))

    p = tmp_path_factory.mktemp("xlsprop") / "t.xls"
    p.write_bytes(_make_cfb(wb, mini=mini))
    pdf = read_xls_stdlib(str(p))

    assert list(pdf.columns) == header
    assert len(pdf) == len(rows)
    for ri, row in enumerate(rows):
        for ci in range(width):
            got = pdf.iloc[ri, ci]
            if ci >= len(row):
                assert got is None or (isinstance(got, float) and got != got)
                continue
            want = row[ci]
            if isinstance(want, bool):
                assert bool(got) == want
            elif isinstance(want, str):
                assert got == want
            else:
                w = float(want)
                assert float(got) == w or (
                    w.is_integer() and float(got) == int(w)
                )


class TestChunkGeometry:
    """The UDTF's imperative emission rule vs the closed form the oracle
    uses — over arbitrary doc lengths, not just the fixture's."""

    @given(n=st.integers(min_value=1, max_value=5000))
    @settings(max_examples=200, deadline=None)
    def test_udtf_rule_matches_closed_form(self, n):
        from ai_duckdb_spark.functions.udf import (
            CHUNK_SIZE,
            CHUNK_STRIDE,
            ChunkDocumentUDTF,
        )

        text = " ".join("x" for _ in range(n))
        rows = list(ChunkDocumentUDTF().eval(1, text))
        expect_chunks = (
            1 if n <= CHUNK_SIZE else 1 + math.ceil((n - CHUNK_SIZE) / CHUNK_STRIDE)
        )
        assert len(rows) == expect_chunks
        assert [r[1] for r in rows] == list(range(expect_chunks))
        for _, idx, n_tok in rows:
            assert n_tok == min(CHUNK_SIZE, n - idx * CHUNK_STRIDE)
        # every token is covered and consecutive chunks overlap (size > stride)
        last_start = (expect_chunks - 1) * CHUNK_STRIDE
        assert last_start + rows[-1][2] == n


class TestBpeMergeProperty:
    """Property: the Spark aggregate-fold merge application equals the
    canonical left-to-right non-overlapping merge for ANY word over a
    small alphabet (the regime where overlap/adjacency corner cases —
    aaa, abab, merged-symbol adjacency — actually occur)."""

    @staticmethod
    def _ref_apply(symbols, left, right):
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    @given(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=8
        ),
        st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]),
    )
    @settings(max_examples=30, deadline=None)
    def test_fold_matches_reference(self, spark, words, rule):
        from ai_duckdb_spark.operators import bpe

        df = spark.createDataFrame([(w, 1) for w in set(words)], "word string, wc long")
        got = {
            r.word: list(r.syms)
            for r in bpe.apply_merge(bpe.with_symbols(df), *rule).collect()
        }
        for w in set(words):
            assert got[w] == self._ref_apply(list(w), *rule), (w, rule, got[w])


# ---------------------------------------------------------------------------
# r7 codec tier: pure-Python roundtrip properties (no Spark session).
# The LZW/ADPCM/resize kernels are exact integer/bit arithmetic, so the
# properties are equalities, not tolerances.
# ---------------------------------------------------------------------------


class TestCodecProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=600),
        st.integers(min_value=2, max_value=8),
    )
    @settings(max_examples=80, deadline=None)
    def test_gif_lzw_roundtrip_any_stream(self, indices, mcs):
        """GIF LZW decode(encode(s)) == s for arbitrary index streams at
        every legal minimum code size (indices capped to the alphabet)."""
        from ai_duckdb_spark.operators import multimodal as M

        alphabet = 1 << mcs
        stream = [i % alphabet for i in indices]
        packed = M._gif_lzw_encode(stream, mcs)
        assert M._gif_lzw_decode(packed, mcs, len(stream)) == stream

    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_gif_container_roundtrip(self, w, h, seed):
        """Full GIF file roundtrip at arbitrary geometry: every pixel
        decodes to the palette entry of its encoded index."""
        from ai_duckdb_spark.operators import multimodal as M

        f = lambda x, y: (seed + 11 * x + 17 * y) % 256
        dw, dh, rows = M.decode_gif_pixels(M.make_gif_image(w, h, f))
        assert (dw, dh) == (w, h)
        assert all(
            rows[y][x] == M._gif_palette(f(x, y)) for y in range(h) for x in range(w)
        )

    @given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_adpcm_decode_is_deterministic_and_bounded(self, samples):
        """IMA ADPCM container roundtrip: frame count and rate are
        preserved exactly, sample 0 is lossless (it rides in the block
        header), every decoded sample stays in int16 range, and decode
        is bit-deterministic."""
        from ai_duckdb_spark.operators import multimodal as M

        wav = M.make_wav_ima_adpcm(16000, samples)
        rate, got = M.decode_wav_ima_adpcm(wav)
        assert rate == 16000 and len(got) == len(samples)
        assert got[0] == samples[0]
        assert all(-32768 <= s <= 32767 for s in got)
        assert M.decode_wav_ima_adpcm(M.make_wav_ima_adpcm(16000, samples))[1] == got

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=255),
    )
    @settings(max_examples=80, deadline=None)
    def test_resize_constant_invariance_and_range(self, sw, sh, dw, dh, v):
        """Resampling invariants at arbitrary geometry: a constant image
        is a fixed point of both kernels, outputs stay in the source
        value range, and identity-size bilinear returns the input."""
        from ai_duckdb_spark.operators import multimodal as M

        const = [[(v, v, v)] * sw for _ in range(sh)]
        for method in ("bilinear", "nearest"):
            out = M.resize_pixels(const, dw, dh, method=method)
            assert out == [[(v, v, v)] * dw for _ in range(dh)]
        grad = [[(x * 20 % 256, y * 30 % 256, (x + y) % 256) for x in range(sw)] for y in range(sh)]
        out = M.resize_pixels(grad, dw, dh)
        lo = [min(p[c] for row in grad for p in row) for c in range(3)]
        hi = [max(p[c] for row in grad for p in row) for c in range(3)]
        assert all(lo[c] <= p[c] <= hi[c] for row in out for p in row for c in range(3))
        assert M.resize_pixels(grad, sw, sh) == grad

    @given(st.integers(min_value=1, max_value=20), st.integers(min_value=1, max_value=18), st.integers(min_value=0, max_value=2**31))
    @settings(max_examples=40, deadline=None)
    def test_jpeg_block_constant_exactness(self, w, h, seed):
        """The oracle contract at arbitrary geometry: per-8x8-block
        constant EVEN values survive the full lossy JPEG pipeline
        bit-exactly (DC-only coefficients, zero quantization loss)."""
        from ai_duckdb_spark.operators import multimodal as M

        f = lambda x, y: 2 * ((seed + 3 * (x // 8) + 7 * (y // 8)) % 128)
        dw, dh, rows = M.decode_jpeg_pixels(M.make_jpeg_image(w, h, f))
        assert (dw, dh) == (w, h)
        assert all(rows[y][x] == f(x, y) for y in range(h) for x in range(w))


# ---------------------------------------------------------------------------
# r12 rewrites pinned against independent pure-Python references.
# ---------------------------------------------------------------------------


class TestR12RewriteProperties:
    _pii_text = st.one_of(
        st.text(alphabet="ab01.-@ <>EMAILPHONE", max_size=40),
        # composites that actually exercise the patterns, including the
        # cross-kind-swallow case (phone-shaped local part of an email)
        st.tuples(
            st.sampled_from(["x", "555-010-1234", "<EMAIL>", "10.0.3.9", ""]),
            st.sampled_from(
                ["u1@a.bc", "555-123-4567@mail.com", "<PHONE>", "1.2.3.4", "z"]
            ),
        ).map(lambda t: f"{t[0]} {t[1]} end"),
    )

    @staticmethod
    def _ref_scrub(text: str) -> tuple[str, int, int, int]:
        """Independent sequential-redaction reference (re.subn chain)."""
        import re

        from ai_duckdb_spark.operators.corpus import PII_PATTERNS

        counts = []
        for kind, pat in PII_PATTERNS.items():
            text, n = re.subn(pat, f"<{kind.upper()}>", text)
            counts.append(n)
        return (text, *counts)

    @given(st.lists(_pii_text, min_size=1, max_size=6))
    @settings(max_examples=15, deadline=None)
    def test_scrub_pii_matches_re_subn_chain(self, spark, texts):
        """scrub_pii's literal-delta counts == an independent re.subn
        sequential redaction on adversarial inputs (pre-existing
        sentinels, overlapping kinds, empty strings)."""
        from ai_duckdb_spark.operators.corpus import scrub_pii

        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
        got = {r.doc_id: r for r in scrub_pii(df).collect()}
        for i, t in enumerate(texts):
            clean, ne, np_, ni = self._ref_scrub(t)
            r = got[i]
            assert (r.clean_text, r.n_email, r.n_phone, r.n_ipv4) == (
                clean,
                ne,
                np_,
                ni,
            ), (t, r)

    @given(
        st.lists(
            st.lists(
                st.sampled_from(["w0", "w1", "w2", "w3", "w4", "w5"]),
                min_size=1,
                max_size=5,
                unique=True,
            ),
            min_size=2,
            max_size=12,
        ),
        st.sampled_from([0.5, 0.75, 0.9]),
    )
    @settings(max_examples=8, deadline=None)
    def test_prefix_jaccard_collapse_equals_exact(self, spark, token_sets, t):
        """The r12 duplication-collapse + chunk-split rewrite of
        jaccard_pairs_prefix must return EXACTLY jaccard_pairs_exact's
        relation on random small-vocabulary corpora — tiny vocab forces
        hot postings, duplicate sets (the same-set 1.0 path), and the
        cross-set fan-back all at once."""
        from ai_duckdb_spark.operators import dedup

        rows = [(i, " ".join(s)) for i, s in enumerate(token_sets)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        exact = {
            (r.id1, r.id2, round(r.jaccard, 9))
            for r in dedup.jaccard_pairs_exact(df, "doc_id", "text", t).collect()
        }
        pref = {
            (r.id1, r.id2, round(r.jaccard, 9))
            for r in dedup.jaccard_pairs_prefix(df, "doc_id", "text", t).collect()
        }
        assert pref == exact, (token_sets, t)

    @staticmethod
    def _ref_simhash60(tokens: set[str]) -> int:
        import hashlib

        votes = [0] * 60
        for tok in tokens:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(60) if votes[b] > 0)

    @given(
        st.lists(
            st.lists(
                st.text(alphabet="abcde0", min_size=1, max_size=6),
                min_size=1,
                max_size=6,
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_simhash60_md5_matches_python_reference(self, spark, docs):
        """The portable fingerprint == an independent hashlib.md5
        majority-vote reference on arbitrary token multisets (the
        operator dedups tokens; the reference uses the set)."""
        from ai_duckdb_spark.operators import dedup

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.simhash for r in dedup.simhash60_md5(df, "doc_id", "text").collect()}
        for i, toks in enumerate(docs):
            assert got[i] == self._ref_simhash60(set(toks)), (toks, got[i])
