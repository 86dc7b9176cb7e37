"""ABI-style hex payload decoding: type grammar + vectorized decoder.

The reference decodes each log's hex ``data`` + ``topics`` through an
ABI with a per-table JS UDF (``parse_logs_udf.sql:1-47``): null on any
parse failure, addresses lowercased, tuples decoded recursively into
structs, indexed dynamic params surfaced as their keccak hash; the
output struct type is generated from the ABI schema including nested
RECORD/REPEATED fields (``parse_table_definition_logic.py:389-406``).

This module is the Spark-first equivalent, built for Arrow batches:

* :func:`parse_abi_type` — recursive grammar over the public Solidity
  ABI type language: ``uintN/intN/address/bool/bytesN/bytes/string``,
  ``T[]`` / ``T[k]`` arrays, ``(T1 name1, T2 name2, ...)`` tuples
  (nested arbitrarily).
* :func:`spark_type` — decoded Spark type per ABI type (ints ≤56 bits
  → ``long``; wider ints → decimal *string*, the reference's BigQuery
  STRING mapping for >64-bit ints; tuples → ``struct``; arrays →
  ``array``).
* :class:`HexFrame` + :func:`decode_batch` — the decode kernel used
  inside ``mapInPandas``. The batch's hex strings become one numpy
  char matrix; every word read is a vectorized gather (per-row varying
  offsets via advanced indexing), head slots, offsets, lengths and
  static values decode with no per-row Python. Variable-length tails
  (dynamic ``bytes``/``string``/arrays) are decoded per distinct
  length group — vectorized within each group, which on fixed-shape
  specs is one group. Failure (truncated data, bad hex, missing
  topics) nulls the whole row, mirroring the UDF's try/catch→null.

Arrays of *dynamic* element types (``string[]``, ``bytes[]``, dynamic
tuples inside arrays, fixed arrays of dynamic elements) decode through
the general ABI head/tail scheme — each element's tail located via its
per-element offset word, recursively (the same generic decode
ethers.js performs for the reference's JS UDF,
parse_logs_udf.sql:6-11) — so the full public ABI type language is
supported.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import types as T

_ELEM_RE = re.compile(r"^(uint|int|address|bool|bytes|string)(\d*)$")
_ARRAY_RE = re.compile(r"^(.*)\[(\d*)\]$")

#: chars per 32-byte ABI word, hex encoded
WORD = 64


class AbiTypeError(ValueError):
    pass


@dataclass(frozen=True)
class AbiType:
    kind: str  # uint|int|address|bool|bytes_fixed|bytes|string|array|fixed_array|tuple
    bits: int = 0  # uint/int width; bytes_fixed byte length
    size: int = 0  # fixed_array length
    elem: "AbiType | None" = None
    components: tuple = field(default=())  # tuple of (name, AbiType)


def parse_abi_type(s: str) -> AbiType:
    s = s.strip()
    m = _ARRAY_RE.match(s)
    if m:
        elem = parse_abi_type(m.group(1))
        if m.group(2):
            return AbiType("fixed_array", size=int(m.group(2)), elem=elem)
        return AbiType("array", elem=elem)
    if s.startswith("("):
        if not s.endswith(")"):
            raise AbiTypeError(f"unbalanced tuple: {s!r}")
        comps = []
        for i, part in enumerate(_split_top(s[1:-1])):
            part = part.strip()
            if not part:
                raise AbiTypeError(f"empty tuple component in {s!r}")
            # optional trailing component name: "<type> <name>"
            name = f"_{i}"
            mname = re.match(r"^(.*?)\s+([A-Za-z_][A-Za-z0-9_]*)$", part)
            if mname and not mname.group(1).rstrip().endswith(","):
                try:
                    t = parse_abi_type(mname.group(1))
                    name = mname.group(2)
                except AbiTypeError:
                    t = parse_abi_type(part)
            else:
                t = parse_abi_type(part)
            comps.append((name, t))
        return AbiType("tuple", components=tuple(comps))
    m = _ELEM_RE.match(s)
    if not m:
        raise AbiTypeError(f"unknown ABI type: {s!r}")
    base, num = m.group(1), m.group(2)
    if base in ("uint", "int"):
        bits = int(num) if num else 256
        if bits % 8 or not 8 <= bits <= 256:
            raise AbiTypeError(f"bad int width: {s!r}")
        return AbiType(base, bits=bits)
    if base == "bytes":
        if num:
            n = int(num)
            if not 1 <= n <= 32:
                raise AbiTypeError(f"bad bytesN: {s!r}")
            return AbiType("bytes_fixed", bits=n)
        return AbiType("bytes")
    if num:
        raise AbiTypeError(f"unknown ABI type: {s!r}")
    return AbiType(base)  # address | bool | string


def _split_top(s: str) -> list[str]:
    """Split on commas not nested inside parentheses/brackets."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def is_dynamic(t: AbiType) -> bool:
    if t.kind in ("bytes", "string", "array"):
        return True
    if t.kind == "fixed_array":
        return is_dynamic(t.elem)
    if t.kind == "tuple":
        return any(is_dynamic(ct) for _, ct in t.components)
    return False


def head_words(t: AbiType) -> int:
    """Words a value occupies in its enclosing tuple's head section."""
    if is_dynamic(t):
        return 1
    if t.kind == "fixed_array":
        return t.size * head_words(t.elem)
    if t.kind == "tuple":
        return sum(head_words(ct) for _, ct in t.components)
    return 1


def spark_type(t: AbiType) -> T.DataType:
    if t.kind in ("uint", "int"):
        limit = 56 if t.kind == "uint" else 64
        return T.LongType() if t.bits <= limit else T.StringType()
    if t.kind in ("address", "bytes_fixed", "bytes", "string"):
        return T.StringType()
    if t.kind == "bool":
        return T.BooleanType()
    if t.kind in ("array", "fixed_array"):
        return T.ArrayType(spark_type(t.elem), True)
    if t.kind == "tuple":
        return T.StructType(
            [T.StructField(n, spark_type(ct), True) for n, ct in t.components]
        )
    raise AbiTypeError(t.kind)


# --------------------------------------------------------------------------
# vectorized decode kernel
# --------------------------------------------------------------------------

_POW16 = (16 ** np.arange(15, -1, -1, dtype=np.uint64))

#: char offset no real row can reach: reads at it fail fast, letting
#: group loops pass masked-out rows through without spawning work
_POISON = np.int64(1) << 40


class HexFrame:
    """A batch of hex strings as one padded numpy char matrix; every
    read is a vectorized gather. Rows accumulate failure in ``fail``."""

    def __init__(self, strings):
        vals = ["" if s is None else (s[2:] if isinstance(s, str) and s.startswith("0x") else s) for s in strings]
        self.n = len(vals)
        self.lengths = np.fromiter((len(v) if isinstance(v, str) else 0 for v in vals), dtype=np.int64, count=self.n)
        self.fail = np.fromiter((not isinstance(v, str) for v in vals), dtype=bool, count=self.n)
        width = max(int(self.lengths.max()), WORD) if self.n else WORD
        padded = "".join(v.ljust(width, "0") if isinstance(v, str) else "0" * width for v in vals)
        mat = np.frombuffer(padded.encode("ascii", "replace"), dtype=np.uint8).reshape(self.n, width) if self.n else np.zeros((0, width), np.uint8)
        # map ASCII → nibble value; 255 marks invalid hex chars
        lut = np.full(256, 255, np.uint8)
        for i, c in enumerate(b"0123456789"):
            lut[c] = i
        for i, c in enumerate(b"abcdef"):
            lut[c] = 10 + i
        for i, c in enumerate(b"ABCDEF"):
            lut[c] = 10 + i
        self.chars = mat
        self.nibs = lut[mat]
        self.width = width

    def _gather(self, starts: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
        """(n, width) gather at per-row char offsets; flags rows whose
        read exceeds their actual string length."""
        bad = (starts < 0) | (starts + width > self.lengths)
        safe = np.where(bad, 0, starts)
        idx = safe[:, None] + np.arange(width)[None, :]
        np.clip(idx, 0, self.width - 1, out=idx)
        return idx, bad

    def nibbles(self, starts: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
        idx, bad = self._gather(starts, width)
        nib = self.nibs[np.arange(self.n)[:, None], idx]
        bad = bad | (nib == 255).any(axis=1)
        return nib, bad

    def text(self, starts: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
        """Raw (lowercased) hex text at the offsets, as an object array
        of python strings — one C-level decode, no per-row slicing."""
        idx, bad = self._gather(starts, width)
        ch = self.chars[np.arange(self.n)[:, None], idx]
        # lowercase A-F in place (vectorized)
        upper = (ch >= 65) & (ch <= 70)
        ch = np.where(upper, ch + 32, ch)
        flat = ch.tobytes().decode("ascii", "replace")
        out = np.empty(self.n, dtype=object)
        for i in range(self.n):  # slicing a str is C-level; no parsing here
            out[i] = flat[i * width:(i + 1) * width]
        return out, bad

    def word_u64(self, word_starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Low 64 bits of the 32-byte word at the given char offsets,
        failing rows where the high 192 bits are nonzero (canonical
        offsets/lengths/small ints never exceed u64)."""
        nib, bad = self.nibbles(word_starts, WORD)
        high_nonzero = nib[:, :48].any(axis=1)
        val = (nib[:, 48:].astype(np.uint64) * _POW16).sum(axis=1)
        return val, bad | high_nonzero

    def word_bigint(self, word_starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Full 256-bit word as an object array of python ints, built
        from four vectorized u64 limbs."""
        nib, bad = self.nibbles(word_starts, WORD)
        limbs = [
            (nib[:, 16 * k:16 * (k + 1)].astype(np.uint64) * _POW16).sum(axis=1)
            for k in range(4)
        ]
        obj = (
            limbs[0].astype(object) * (1 << 192)
            + limbs[1].astype(object) * (1 << 128)
            + limbs[2].astype(object) * (1 << 64)
            + limbs[3].astype(object)
        )
        return obj, bad


def _decode_value(frame: HexFrame, starts: np.ndarray, t: AbiType):
    """Decode a STATIC value at per-row char offsets → (object-or-np
    array of decoded values, fail mask). All word math vectorized."""
    if t.kind in ("uint", "int"):
        if t.bits <= 64 and (t.kind == "int" or t.bits <= 56):
            val, bad = frame.word_u64(starts)
            if t.kind == "int":
                nib, bad2 = frame.nibbles(starts, WORD)
                neg = nib[:, 0] >= 8
                # sign-extend: high nibbles must be all F for negatives
                ext_ok = np.where(neg, (nib[:, :48] == 15).all(axis=1), ~nib[:, :48].any(axis=1))
                # word_u64 pre-fails high-192-nonzero rows, which is
                # wrong for negatives (their high bits are all F) — the
                # sign-aware re-read stands in; for negatives only the
                # ext_ok test applies
                bad = bad2 | ~ext_ok
                signed = val.astype(np.int64)  # two's complement reinterpret
                # canonical range (ADVICE r2): a positive word whose low
                # bits exceed intN's positive range (e.g. the 2**63 word
                # for int64) is a non-canonical encoding the reference
                # UDF nulls — int64 wrap-to-negative must not pass
                if t.bits < 64:
                    half = np.int64(1) << (t.bits - 1)
                    bad |= (~neg & (signed >= half)) | (neg & (signed < -half))
                else:
                    bad |= ~neg & (nib[:, 48] >= 8)  # bit63 set on a positive
                return signed.astype(object), bad
            # uint <= 56 bits: value must fit the declared width
            bad = bad | (val >= np.uint64(1 << t.bits))
            return val.astype(np.int64).astype(object), bad
        obj, bad = frame.word_bigint(starts)
        if t.kind == "int":
            wrap = obj >= (1 << 255)
            obj = np.where(wrap, obj - (1 << 256), obj)
            if t.bits < 256:
                half = 1 << (t.bits - 1)
                bad = bad | ((obj >= half) | (obj < -half)).astype(bool)
        elif t.bits < 256:
            bad = bad | (obj >= (1 << t.bits)).astype(bool)
        return np.array([str(x) for x in obj], dtype=object), bad
    if t.kind == "address":
        txt, bad = frame.text(starts + 24, 40)
        return np.array(["0x" + s for s in txt], dtype=object), bad
    if t.kind == "bool":
        val, bad = frame.word_u64(starts)
        return (val != 0).astype(object), bad
    if t.kind == "bytes_fixed":
        txt, bad = frame.text(starts, 2 * t.bits)
        return np.array(["0x" + s for s in txt], dtype=object), bad
    if t.kind == "fixed_array":
        w = head_words(t.elem) * WORD
        cols, bad = [], np.zeros(frame.n, bool)
        for i in range(t.size):
            v, b = _decode_value(frame, starts + i * w, t.elem)
            cols.append(v)
            bad |= b
        stacked = np.empty(frame.n, dtype=object)
        for r in range(frame.n):
            stacked[r] = [c[r] for c in cols]
        return stacked, bad
    if t.kind == "tuple":
        return _decode_tuple(frame, starts, t.components)
    raise AbiTypeError(f"_decode_value got dynamic type {t.kind}")


def _decode_dynamic(frame: HexFrame, tail_starts: np.ndarray, t: AbiType):
    """Decode a DYNAMIC value whose tail begins at per-row offsets."""
    if t.kind in ("bytes", "string"):
        ln, bad = frame.word_u64(tail_starts)
        # a length the row's remaining data cannot hold is corrupt — and
        # guards the per-length loop/allocation against garbage lengths
        avail = np.maximum(frame.lengths - (tail_starts + WORD), 0)
        bad = bad | (ln.astype(np.float64) * 2 > avail)
        out = np.empty(frame.n, dtype=object)
        data_start = tail_starts + WORD
        for L in np.unique(ln[~bad]):
            sel = (ln == L) & ~bad
            width = int(L) * 2
            if width == 0:
                out[sel] = "" if t.kind == "string" else "0x"
                continue
            txt, b2 = frame.text(np.where(sel, data_start, 0), width)
            bad |= b2 & sel
            if t.kind == "string":
                for r in np.nonzero(sel)[0]:
                    try:
                        out[r] = bytes.fromhex(txt[r]).decode("utf-8")
                    except (ValueError, UnicodeDecodeError):
                        bad[r] = True
            else:
                for r in np.nonzero(sel)[0]:
                    out[r] = "0x" + txt[r]
        return out, bad
    if t.kind == "array":
        ln, bad = frame.word_u64(tail_starts)
        dyn = is_dynamic(t.elem)
        # head width per element: dynamic elems occupy ONE offset word
        w = WORD if dyn else head_words(t.elem) * WORD
        avail = np.maximum(frame.lengths - (tail_starts + WORD), 0)
        bad = bad | (ln.astype(np.float64) * w > avail)
        out = np.empty(frame.n, dtype=object)
        for L in np.unique(ln[~bad]):
            sel = (ln == L) & ~bad
            # rows outside the group read at a poisoned offset: every
            # gather fails fast, so garbage can't spawn work (their
            # fail bits are masked out below)
            base = np.where(sel, tail_starts + WORD, _POISON)
            cols = []
            for i in range(int(L)):
                if dyn:
                    # general head/tail scheme (ethers.js-equivalent,
                    # ref parse_logs_udf.sql:6-11): element i's offset
                    # word is relative to the element area start
                    off, b0 = frame.word_u64(base + i * WORD)
                    b0 = b0 | (off.astype(np.float64) * 2 > avail)
                    tail_i = np.where(
                        sel & ~b0, base + off.astype(np.int64) * 2, _POISON
                    )
                    v, b2 = _decode_dynamic(frame, tail_i, t.elem)
                    b2 = b0 | b2
                else:
                    v, b2 = _decode_value(frame, base + i * w, t.elem)
                bad |= b2 & sel
                cols.append(v)
            for r in np.nonzero(sel & ~bad)[0]:
                out[r] = [c[r] for c in cols]
        return out, bad
    if t.kind == "tuple":
        return _decode_tuple(frame, tail_starts, t.components)
    if t.kind == "fixed_array":
        # fixed array of DYNAMIC elements (the array itself is dynamic):
        # size offset words relative to the array start, no length word
        avail = np.maximum(frame.lengths - tail_starts, 0)
        bad = np.zeros(frame.n, bool)
        cols = []
        for i in range(t.size):
            off, b0 = frame.word_u64(tail_starts + i * WORD)
            b0 = b0 | (off.astype(np.float64) * 2 > avail)
            tail_i = np.where(~b0, tail_starts + off.astype(np.int64) * 2, _POISON)
            v, b2 = _decode_dynamic(frame, tail_i, t.elem)
            bad |= b0 | b2
            cols.append(v)
        out = np.empty(frame.n, dtype=object)
        for r in np.nonzero(~bad)[0]:
            out[r] = [c[r] for c in cols]
        return out, bad
    raise AbiTypeError(f"_decode_dynamic got static type {t.kind}")


def _decode_tuple(frame: HexFrame, base: np.ndarray, comps):
    """Decode a tuple laid out at per-row char offsets ``base``:
    static comps inline, dynamic comps via head offset words (offsets
    are relative to the tuple's own start, per the ABI spec)."""
    head = 0
    values, bad = [], np.zeros(frame.n, bool)
    for _name, ct in comps:
        slot = base + head * WORD
        if is_dynamic(ct):
            off_bytes, b = frame.word_u64(slot)
            bad |= b
            tail = base + (off_bytes.astype(np.int64) * 2)
            v, b2 = _decode_dynamic(frame, tail, ct)
        else:
            v, b2 = _decode_value(frame, slot, ct)
        bad |= b2
        values.append(v)
        head += head_words(ct)
    out = np.empty(frame.n, dtype=object)
    names = [n for n, _ in comps]
    for r in range(frame.n):
        out[r] = {names[i]: values[i][r] for i in range(len(names))}
    return out, bad


def decode_batch(data_strings, topics_lists, fields):
    """Decode one Arrow batch.

    ``fields``: list of (name, AbiType, indexed). Non-indexed fields
    decode from ``data`` as one top-level tuple; indexed fields decode
    from ``topics[1+i]`` in declaration order — value types directly,
    dynamic types as their keccak hash verbatim (the reference's
    ``isIndexed → paramValue.hash``, parse_logs_udf.sql:29-31).

    Returns (dict name → object ndarray, fail mask); callers null the
    failed rows (log parse drops them, trace parse keeps + error col).
    """
    n = len(data_strings)
    frame = HexFrame(data_strings)
    fail = frame.fail.copy()

    # indexed params ride topics: build per-slot string columns
    topic_cols: list[list] = []
    n_indexed = sum(1 for _, _, ix in fields if ix)
    for slot in range(n_indexed):
        col = []
        for tp in topics_lists:
            if tp is None or len(tp) <= 1 + slot or tp[1 + slot] is None:
                col.append(None)
            else:
                col.append(tp[1 + slot])
        topic_cols.append(col)

    out: dict[str, np.ndarray] = {}
    # non-indexed: one tuple over data
    plain = [(name, t) for name, t, ix in fields if not ix]
    if plain:
        base = np.zeros(n, dtype=np.int64)
        tup, bad = _decode_tuple(frame, base, tuple(plain))
        fail |= bad
        for name, _t in plain:
            col = np.empty(n, dtype=object)  # explicit: list values must stay rows
            for i, d in enumerate(tup):
                col[i] = d[name] if isinstance(d, dict) else None
            out[name] = col

    slot = 0
    for name, t, ix in fields:
        if not ix:
            continue
        col = topic_cols[slot]
        slot += 1
        missing = np.fromiter((c is None for c in col), dtype=bool, count=n)
        if is_dynamic(t) or t.kind in ("tuple", "array", "fixed_array"):
            # hash only — surface the topic hex verbatim, lowercased
            vals = np.array(
                [None if c is None else (c if c.startswith("0x") else "0x" + c).lower() for c in col],
                dtype=object,
            )
            out[name] = vals
            fail |= missing
        else:
            tframe = HexFrame(col)
            v, bad = _decode_value(tframe, np.zeros(n, dtype=np.int64), t)
            out[name] = v
            fail |= bad | missing | tframe.fail
    # null out failed rows
    for name in out:
        out[name][fail] = None
    return out, fail
