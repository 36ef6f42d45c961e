"""Text analysis kernels: normalization, token counting, quality scoring,
language-ID, fingerprinting — all vectorized Arrow/numpy, all (except the
fingerprint) designed to be mirrored exactly in ANSI SQL for the oracle.

Normalization mirrors the reference CLI's cell cleanup: collapse
``[ \\n\\r\\t]+`` to one space, trim, drop blank rows
(/root/reference/cmd/grate2tsv/main.go:162-164,231-259).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WS_PATTERN = r"[ \n\r\t]+"


def normalize_text(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    out = pc.replace_substring_regex(col, pattern=WS_PATTERN, replacement=" ")
    return pc.utf8_trim(out, characters=" ")


def token_count(norm: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Whitespace token count of already-normalized text:
    len(norm) - len(replace(norm,' ','')) + 1, 0 for empty."""
    n = pc.utf8_length(norm)
    no_sp = pc.utf8_length(pc.replace_substring(norm, pattern=" ", replacement=""))
    toks = pc.add(pc.subtract(n, no_sp), 1)
    return pc.if_else(pc.equal(n, 0), pa.scalar(0, toks.type), toks)


def _count_kept(col, keep_class: str):
    """#chars in a class = len(regexp_replace(text, '[^class]', ''))."""
    kept = pc.replace_substring_regex(
        col, pattern=f"[^{keep_class}]", replacement=""
    )
    return pc.utf8_length(kept)


def quality_features(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality features + score over a text column.

    Every feature is a length-difference trick so the DuckDB oracle can
    reproduce it exactly:
      n_chars, n_tokens, punct (.,!?;:), digits, alpha ratio,
      quality_score = n_tokens in [5,1000] and punct_ratio < 0.2
                      and digit_ratio < 0.3 (as int 0/1).
    """
    text = t[text_col]
    norm = normalize_text(text)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = token_count(norm).cast(pa.int64())
    n_punct = _count_kept(text, r".,!?;:").cast(pa.int64())
    n_digit = _count_kept(text, r"0-9").cast(pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())).cast(pa.float64())
    punct_ratio = pc.divide(n_punct.cast(pa.float64()), denom)
    digit_ratio = pc.divide(n_digit.cast(pa.float64()), denom)
    ok = pc.and_(
        pc.and_(
            pc.greater_equal(n_tokens, 5),
            pc.less_equal(n_tokens, 1000),
        ),
        pc.and_(pc.less(punct_ratio, 0.2), pc.less(digit_ratio, 0.3)),
    )
    out = t.select([c for c in t.column_names if c != text_col])
    for name, col in [
        ("n_chars", n_chars),
        ("n_tokens", n_tokens),
        ("n_punct", n_punct),
        ("n_digits", n_digit),
        ("punct_ratio", punct_ratio),
        ("digit_ratio", digit_ratio),
        ("quality_ok", pc.cast(ok, pa.int32())),
    ]:
        out = out.append_column(name, col)
    return out


# language-ID: ordered stopword heuristic; first match wins. The SQL mirror
# is a CASE expression with the same patterns in the same order.
LANG_MARKERS: list[tuple[str, str]] = [
    ("zh", " 的 "),
    ("es", " el "),
    ("de", " der "),
    ("fr", " le "),
    ("en", " the "),
]


def lang_id(norm: pa.ChunkedArray | pa.Array) -> pa.Array:
    """N-gram-marker language guess over normalized text; 'und' if no
    marker hits. Padded with spaces so markers match whole tokens.
    Null input yields 'und' (the SQL CASE mirror's ELSE branch also
    lands on 'und' for NULL — keep the two sides identical)."""
    norm = pc.fill_null(norm, "")
    padded = pc.binary_join_element_wise(pa.scalar(" "), norm, pa.scalar(" "), "")
    guess = pa.nulls(len(padded), pa.string())
    done = pa.array(np.zeros(len(padded), dtype=bool))
    for code, marker in LANG_MARKERS:
        hit = pc.match_substring(padded, marker)
        take = pc.and_(hit, pc.invert(done))
        guess = pc.if_else(take, pa.scalar(code), guess)
        done = pc.or_(done, hit)
    return pc.if_else(done, guess, pa.scalar("und"))


# BPE-ish tokenizer split pattern (GPT-2 style word/number/punct pieces,
# RE2-safe — no lookaheads, so Arrow and DuckDB count identically)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized BPE-ish token count (one regex pass per batch); the SQL
    mirror is ``length(regexp_extract_all(text, pattern))`` — same RE2
    engine, same counts."""
    return pc.cast(
        pc.count_substring_regex(pc.fill_null(col, ""), pattern=BPE_PATTERN),
        pa.int64(),
    )


URL_PATTERN = r"(?P<url>https?://[^ ]+)"


def extract_first_link(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """First URL per document, rendered as the reference's hyperlink cell
    form ``display <url>`` (T15 recast,
    /root/reference/xls/hyperlinks.go:11-146 — the moniker archaeology is
    a non-goal; the *projection* of link targets out of cell text is the
    data-processing behavior kept). Vectorized ``pc.extract_regex``;
    null when the document has no URL."""
    hit = pc.extract_regex(col, pattern=URL_PATTERN)
    return pc.struct_field(hit, "url")


# --- HLINK binary decode (T15 full parity) -----------------------------------
#
# Field-for-field mirror of the reference's hyperlink archaeology
# (/root/reference/xls/hyperlinks.go:11-146): classid skip, version==2,
# flag-gated display/frame/moniker/location blocks, URL- and file-moniker
# classids, and the trailing-GUID strip on URL monikers. The encoder
# exists so fixtures/tests can synthesize real records (the reference
# only reads).

HL_HAS_MONIKER = 0x001
HL_HAS_LOCATION = 0x008
HL_HAS_DISPLAY = 0x010
HL_HAS_FRAME = 0x080
HL_MONIKER_AS_STR = 0x100

URL_MONIKER_CLSID = bytes(
    [0xE0, 0xC9, 0xEA, 0x79, 0xF9, 0xBA, 0xCE, 0x11,
     0x8C, 0x82, 0x00, 0xAA, 0x00, 0x4B, 0xA9, 0x0B]
)
FILE_MONIKER_CLSID = bytes(
    [0x03, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
     0xC0, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x46]
)

_HL_TRIM = " \v\f\t\r\n\x00"


def _hl_string(raw: memoryview, pos: int) -> tuple[str, int]:
    """HyperlinkString: u32 char count + that many UTF-16LE code units."""
    import struct

    (n,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    s = bytes(raw[pos : pos + 2 * n]).decode("utf-16-le")
    return s, pos + 2 * n


def decode_hyperlink(raw: bytes) -> tuple[str, str]:
    """(display, link) out of one HLINK payload (the bytes AFTER the
    8-byte range header) — hyperlinks.go:11-74 plus both moniker kinds
    (parseHyperlinkMoniker, :76-133)."""
    import struct

    mv = memoryview(raw)
    pos = 16  # classid
    (version,) = struct.unpack_from("<I", mv, pos)
    if version != 2:
        raise ValueError("unknown hyperlink version")
    (flags,) = struct.unpack_from("<I", mv, pos + 4)
    pos += 8
    display = link = ""
    if flags & HL_HAS_DISPLAY:
        display, pos = _hl_string(mv, pos)
    if flags & HL_HAS_FRAME:
        (n,) = struct.unpack_from("<I", mv, pos)
        pos += 4 + 2 * n
    if flags & HL_HAS_MONIKER:
        if flags & HL_MONIKER_AS_STR:
            link, pos = _hl_string(mv, pos)
        else:
            clsid = bytes(mv[pos : pos + 16])
            pos += 16
            if clsid == URL_MONIKER_CLSID:
                (nbytes,) = struct.unpack_from("<I", mv, pos)
                pos += 4
                units = bytes(mv[pos : pos + nbytes])
                pos += nbytes
                n = nbytes // 2
                buf = units
                # strip the trailing serialGUID+version+flags block when
                # the terminator marks it (hyperlinks.go:103-105)
                if n > 12 and units[2 * (n - 13)] == 0 and units[2 * (n - 13) + 1] == 0:
                    buf = units[: 2 * (n - 12)]
                link = buf.decode("utf-16-le")
            elif clsid == FILE_MONIKER_CLSID:
                (alen,) = struct.unpack_from("<I", mv, pos + 2)  # skip cAnti
                pos += 6
                ansi = bytes(mv[pos : pos + alen])
                pos += alen + 24  # misc fixed properties
                (ulen,) = struct.unpack_from("<I", mv, pos)
                pos += 4
                if ulen > 0:
                    pos += 6
                    ulen -= 6
                    link = bytes(mv[pos : pos + ulen]).decode("utf-16-le")
                    pos += ulen
                else:
                    link = ansi.decode("latin-1")
            else:
                raise ValueError("unknown moniker classid")
    if flags & HL_HAS_LOCATION:
        link, pos = _hl_string(mv, pos)
    return display.strip(_HL_TRIM), link.strip(_HL_TRIM)


def encode_hyperlink(
    display: str, url: str, kind: str = "url_moniker"
) -> bytes:
    """Synthesize a decodable HLINK payload. ``kind``: ``url_moniker``
    (classid + UTF-16 + NUL + 24-byte GUID tail), ``moniker_str``
    (hlstmfMonikerSavedAsStr HyperlinkString) or ``location``
    (no moniker; hlstmfHasLocationStr carries the target)."""
    import struct

    def hl_string(s: str) -> bytes:
        u = s.encode("utf-16-le")
        return struct.pack("<I", len(u) // 2) + u

    flags = HL_HAS_DISPLAY
    body = b""
    if kind == "url_moniker":
        flags |= HL_HAS_MONIKER
        u = url.encode("utf-16-le") + b"\x00\x00" + b"\xAA" * 24
        body = URL_MONIKER_CLSID + struct.pack("<I", len(u)) + u
    elif kind == "moniker_str":
        flags |= HL_HAS_MONIKER | HL_MONIKER_AS_STR
        body = hl_string(url)
    elif kind == "location":
        flags |= HL_HAS_LOCATION
        body = hl_string(url)
    else:
        raise ValueError(f"unknown hyperlink kind {kind!r}")
    return (
        b"\x00" * 16
        + struct.pack("<II", 2, flags)
        + hl_string(display)
        + body
    )


def fingerprint64(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Deterministic 64-bit document fingerprint: the low 8 md5 digest
    bytes, little-endian — bit-identical to DuckDB's
    ``md5_number_lower(text)``, so the fingerprint relation has an exact
    SQL oracle. Returned as uint64 (UBIGINT on the SQL side)."""
    import hashlib

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, v in enumerate(texts.to_pylist()):
        d = hashlib.md5((v or "").encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return pa.array(out)


# --- PII redaction ----------------------------------------------------------

# RE2-safe patterns, mirrored verbatim in the SQL oracle
EMAIL_PATTERN = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
PHONE_PATTERN = r"\+1-[0-9]{3}-[0-9]{4}"


def redact_pii(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Replace emails/phones with typed placeholders — the standard
    LLM-corpus scrub, fully vectorized (two RE2 passes per batch)."""
    out = pc.replace_substring_regex(
        col, pattern=EMAIL_PATTERN, replacement="[EMAIL]"
    )
    return pc.replace_substring_regex(
        out, pattern=PHONE_PATTERN, replacement="[PHONE]"
    )


# --- within-document repetition (Gopher-style quality signal) ---------------


def word_repetition(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc duplicate-word statistics: total words, distinct words,
    and the repetitive flag (distinct*2 < total — a Gopher-style
    repetition filter). Vectorized: one split, one flatten, one
    drop_duplicates over (doc, word) pairs, two bincounts."""
    import pandas as pd

    norm = pc.fill_null(normalize_text(t[text_col].combine_chunks()), "")
    words = pc.split_pattern(norm, pattern=" ")
    lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    n = len(t)
    parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten().to_numpy(zero_copy_only=False)
    pairs = pd.DataFrame({"d": parent, "w": flat}).drop_duplicates()
    uniq = np.bincount(pairs["d"].to_numpy(), minlength=n).astype(np.int64)
    total = lengths.astype(np.int64)
    # empty text: split('') yields one '' token; count it as zero words
    empty = pc.equal(pc.utf8_length(norm), 0).to_numpy(zero_copy_only=False)
    total[empty] = 0
    uniq[empty] = 0
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(total),
            "n_uniq_words": pa.array(uniq),
            "repetitive": pa.array(uniq * 2 < total),
        }
    )


_STRATA_DEFAULT = {"en": 2, "zh": 6, "es": 6, "de": 6, "fr": 6}


def stratified_sample(
    t: pa.Table,
    rates: dict[str, int] | None = None,
    denom: int = 8,
    default: int = 0,
    strat_col: str = "lang",
    text_col: str = "text",
) -> pa.Table:
    """Deterministic per-stratum downsampling — the language/domain
    rebalancing step of a training-data mix: keep a row iff

        fingerprint64(text) mod denom < rates[stratum]

    so each stratum gets its own reproducible keep-rate (rates/denom)
    with NO shuffle, no RNG and no driver state — one vectorized batch
    kernel (content hash & mask + an ``index_in`` rate lookup against
    the tiny broadcast strata table). Unknown strata fall back to
    ``default`` (0 = drop, the conservative choice for an unvetted
    source). denom must be a power of two (hash & (denom-1) ≡ mod).
    """
    rates = _STRATA_DEFAULT if rates is None else rates
    assert denom & (denom - 1) == 0, "denom must be a power of two"
    strat = t[strat_col]
    if isinstance(strat, pa.ChunkedArray):
        strat = strat.combine_chunks()
    keys = pa.array(sorted(rates), pa.string())
    vals = np.array([rates[k] for k in sorted(rates)], dtype=np.int64)
    idx = (
        pc.fill_null(pc.index_in(strat, value_set=keys), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    k = np.where(idx < 0, default, vals[np.maximum(idx, 0)]).astype(np.uint64)
    fp = fingerprint64(t[text_col])
    bucket = pc.bit_wise_and(fp, pa.scalar(denom - 1, pa.uint64()))
    keep = pc.less(bucket, pa.array(k))
    return t.filter(keep)


def readability(ds, n_parts: int = 8):
    """Flesch-style reading-ease score per document from three exact
    counts — whitespace tokens, sentence-terminator runs ([.!?]+) and
    vowel runs as the syllable proxy — all RE2-vectorized Arrow kernels,
    shuffle-free, one output row per doc. Deterministic bit-for-bit
    (per-row arithmetic only, no aggregation)."""
    from .num import sql_round

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("n_sentences", pa.int64()),
            pa.field("n_syllables", pa.int64()),
            pa.field("flesch", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        text = pc.coalesce(t["text"].combine_chunks(), pa.scalar("", pa.string()))
        norm = normalize_text(text)
        toks = token_count(norm).cast(pa.int64())
        sents = pc.count_substring_regex(text, pattern="[.!?]+").cast(pa.int64())
        syll = pc.count_substring_regex(
            pc.utf8_lower(text), pattern="[aeiou]+"
        ).cast(pa.int64())
        w = np.maximum(toks.to_numpy(zero_copy_only=False), 1).astype(np.float64)
        s = np.maximum(sents.to_numpy(zero_copy_only=False), 1).astype(np.float64)
        y = syll.to_numpy(zero_copy_only=False).astype(np.float64)
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": toks,
                "n_sentences": sents,
                "n_syllables": syll,
                "flesch": sql_round(pa.array(flesch), 6),
            },
            schema=out_schema,
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_length_hist(ds, n_parts: int = 8):
    """Corpus length profile: log2-bucketed whitespace-token-count
    histogram — the shape report an LLM-prep run uses to pick chunk and
    pack sizes. Per-batch histogram combiner (O(buckets) rows leave each
    block), one tiny keyed sum."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle

    configure_shuffle(8)

    hist_schema = pa.schema(
        [pa.field("bucket", pa.int64()), pa.field("n_docs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        text = pc.coalesce(t["text"].combine_chunks(), pa.scalar("", pa.string()))
        toks = token_count(normalize_text(text)).to_numpy(zero_copy_only=False)
        toks = toks[toks > 0]
        if len(toks) == 0:
            return hist_schema.empty_table()
        b = np.floor(np.log2(toks.astype(np.float64))).astype(np.int64)
        keys, n = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(keys), "n_docs": pa.array(n.astype(np.int64))},
            schema=hist_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
