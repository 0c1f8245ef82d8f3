"""Independent zstd ENCODER for tests (RFC 8878), built from the spec with
no imports from the engine's decoder.

The container has no zstd wheel (tests/INTEROP_PROBE.md), so — as with
blosclz/lz4/snappy — differential coverage comes from an independently
written counterpart: this module CONSTRUCTS spec-conformant frames
(FSE-coded sequences over predefined or custom described tables, Huffman
literals in 1- and 4-stream forms, direct and FSE-compressed weights,
repeat modes, repeated offsets), and the tests assert the engine decoder
regenerates the original bytes.

Encoding approach: FSE streams are built by walking the DECODE state
machine backwards — for a wanted symbol sequence, pick a final state and
chain predecessors via the unique state `u` (sym(u) == wanted) whose
[baseline, baseline + 2^nb) window contains the successor state; the bits
the decoder will read are (successor - baseline, nb). This produces
exactly the bitstream a conformant decoder consumes, without transcribing
zstd's encoder internals.
"""

from __future__ import annotations

import struct

MAGIC = 0xFD2FB528

# ---- public constants transcribed from RFC 8878 (same tables any
# implementation must carry; kept separate from the engine's copies)

LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
              2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, -1, -1, -1, -1, -1]

LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                             256, 512, 1024, 2048, 4096, 8192, 16384,
                             32768, 65536]
LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                      13, 14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                99, 131, 259, 515, 1027, 2051, 4099, 8195,
                                16387, 32771, 65539]
ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                      12, 13, 14, 15, 16]


# --------------------------------------------------------- bit plumbing


class BackWriter:
    """Backward-stream writer: fields are appended in DECODE-READ order;
    bytes() prepends the sentinel 1 and packs LSB-first."""

    def __init__(self):
        self.val = 0
        self.bits = 0

    def put(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits) or nbits == 0
        self.val = (self.val << nbits) | value
        self.bits += nbits

    def bytes(self) -> bytes:
        total = self.bits + 1
        v = (1 << self.bits) | self.val  # sentinel on top
        return v.to_bytes((total + 7) // 8, "little")


class FwdWriter:
    """Forward LSB-first writer (FSE table descriptions)."""

    def __init__(self):
        self.val = 0
        self.bits = 0

    def put(self, value: int, nbits: int) -> None:
        self.val |= value << self.bits
        self.bits += nbits

    def bytes(self) -> bytes:
        return self.val.to_bytes((self.bits + 7) // 8, "little") if self.bits else b""


# ----------------------------------------------------------- FSE tables


def fse_decode_table(probs, log):
    """(sym, nb, base) arrays of the canonical decode table — transcribed
    from the spec's spread + state-numbering rules."""
    size = 1 << log
    cells = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            cells[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            cells[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    assert pos == 0
    nxt = [1 if p == -1 else p for p in probs]
    sym, nb, base = [0] * size, [0] * size, [0] * size
    for i in range(size):
        s = cells[i]
        x = nxt[s]
        nxt[s] += 1
        bits = log - (x.bit_length() - 1)
        sym[i], nb[i], base[i] = s, bits, (x << bits) - size
    return sym, nb, base


class FseWalk:
    """Backward walk over one decode machine: given the wanted symbol
    sequence, produce (init_state, [(bits, nb) update fields])."""

    def __init__(self, probs, log):
        self.log = log
        self.sym, self.nb, self.base = fse_decode_table(probs, log)
        self.by_sym: dict[int, list[int]] = {}
        for st, s in enumerate(self.sym):
            self.by_sym.setdefault(s, []).append(st)

    def walk(self, symbols):
        assert symbols
        states = [self.by_sym[symbols[-1]][0]]
        for s in reversed(symbols[:-1]):
            succ = states[0]
            for u in self.by_sym[s]:
                if self.base[u] <= succ < self.base[u] + (1 << self.nb[u]):
                    states.insert(0, u)
                    break
            else:  # pragma: no cover - construction invariant
                raise AssertionError("no predecessor state")
        fields = [
            (states[i + 1] - self.base[states[i]], self.nb[states[i]])
            for i in range(len(states) - 1)
        ]
        return states[0], fields


def write_fse_description(probs, log) -> bytes:
    """Forward-bitstream FSE table description (accuracy log, threshold-
    coded counts, 2-bit zero-repeat flags)."""
    w = FwdWriter()
    w.put(log - 5, 4)
    remaining = (1 << log) + 1
    threshold = 1 << log
    nb = log + 1
    i = 0
    while remaining > 1:
        p = probs[i]
        i += 1
        value = p + 1
        maxv = (2 * threshold - 1) - remaining
        if value < maxv:
            w.put(value, nb - 1)
        else:
            v = value if value < threshold else value + maxv
            w.put(v & ((1 << nb) - 1), nb)
        remaining -= -p if p < 0 else p
        if p == 0 and remaining > 1:
            # zero-repeat flags: count following zeros in chunks of 3
            zeros = 0
            while i + zeros < len(probs) and probs[i + zeros] == 0:
                zeros += 1
            run = zeros
            while run >= 3:
                w.put(3, 2)
                run -= 3
            w.put(run, 2)
            i += zeros
        while remaining < threshold:
            nb -= 1
            threshold >>= 1
    return w.bytes()


# ------------------------------------------------------------- sequences


def _code_for(value, bases, bits):
    for c in range(len(bases) - 1, -1, -1):
        if bases[c] <= value < bases[c] + (1 << bits[c]):
            return c, value - bases[c]
    raise AssertionError(f"no code for {value}")


def encode_sequences(seqs, ll_spec, of_spec, ml_spec) -> bytes:
    """Sequences section for already-resolved (ll, offset_value, ml)
    triples. Each *_spec is ("predef",) | ("rle", symbol) |
    ("fse", probs, log) — mode bytes + descriptions + the interleaved
    bitstream, per the spec's read order."""
    nseq = len(seqs)
    out = bytearray()
    if nseq < 128:
        out.append(nseq)
    elif nseq < 0x7F00:
        out.append(128 + (nseq >> 8))
        out.append(nseq & 0xFF)
    else:
        out += bytes([255, (nseq - 0x7F00) & 0xFF, (nseq - 0x7F00) >> 8])
    mode_of = {"predef": 0, "rle": 1, "fse": 2, "repeat": 3}
    modes = (mode_of[ll_spec[0]] << 6) | (mode_of[of_spec[0]] << 4) | (
        mode_of[ml_spec[0]] << 2)
    out.append(modes)

    def resolve(spec, default_probs, default_log):
        if spec[0] == "predef":
            return FseWalk(default_probs, default_log), b""
        if spec[0] == "repeat":
            # caller guarantees the previous block installed this table;
            # spec carries (probs, log) to rebuild the walk locally
            return FseWalk(spec[1], spec[2]), b""
        if spec[0] == "rle":
            # degenerate machine: one state, 0 bits
            class _R:
                log = 0

                def walk(self, symbols):
                    return 0, [(0, 0)] * (len(symbols) - 1)
            return _R(), bytes([spec[1]])
        return FseWalk(spec[1], spec[2]), write_fse_description(spec[1], spec[2])

    ll_codes, ll_extra = [], []
    of_codes, of_extra = [], []
    ml_codes, ml_extra = [], []
    for ll, ov, ml in seqs:
        c, e = _code_for(ll, LL_BASE, LL_BITS)
        ll_codes.append(c)
        ll_extra.append((e, LL_BITS[c]))
        oc = ov.bit_length() - 1
        of_codes.append(oc)
        of_extra.append((ov - (1 << oc), oc))
        c, e = _code_for(ml, ML_BASE, ML_BITS)
        ml_codes.append(c)
        ml_extra.append((e, ML_BITS[c]))

    ll_m, ll_desc = resolve(ll_spec, LL_DEFAULT, 6)
    of_m, of_desc = resolve(of_spec, OF_DEFAULT, 5)
    ml_m, ml_desc = resolve(ml_spec, ML_DEFAULT, 6)
    out += ll_desc + of_desc + ml_desc
    ll0, ll_fields = ll_m.walk(ll_codes)
    of0, of_fields = of_m.walk(of_codes)
    ml0, ml_fields = ml_m.walk(ml_codes)

    w = BackWriter()
    w.put(ll0, ll_m.log)
    w.put(of0, of_m.log)
    w.put(ml0, ml_m.log)
    for i in range(nseq):
        w.put(*of_extra[i])
        w.put(*ml_extra[i])
        w.put(*ll_extra[i])
        if i + 1 < nseq:
            w.put(*ll_fields[i])
            w.put(*ml_fields[i])
            w.put(*of_fields[i])
    out += w.bytes()
    return bytes(out)


# --------------------------------------------------------------- Huffman


class HufCode:
    """Canonical codes from explicit weights (last implied)."""

    def __init__(self, weights):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        target = 1 << total.bit_length()
        implied = target - total
        assert implied & (implied - 1) == 0
        self.explicit = list(weights)
        full = list(weights) + [implied.bit_length()]
        self.max_bits = target.bit_length() - 1
        self.code: dict[int, tuple[int, int]] = {}
        pos = 0
        for w in range(1, self.max_bits + 1):
            span = 1 << (w - 1)
            for s, ws in enumerate(full):
                if ws == w:
                    nb = self.max_bits + 1 - w
                    self.code[s] = (pos >> (self.max_bits - nb), nb)
                    pos += span
        assert pos == 1 << self.max_bits

    def encode_stream(self, data: bytes) -> bytes:
        w = BackWriter()
        for b in data:
            w.put(*self.code[b])
        return w.bytes()

    def tree_direct(self) -> bytes:
        n = len(self.explicit)
        out = bytearray([127 + n])
        for i in range(0, n, 2):
            hi = self.explicit[i] << 4
            lo = self.explicit[i + 1] if i + 1 < n else 0
            out.append(hi | lo)
        return bytes(out)

    def tree_fse(self, probs, log) -> bytes:
        """FSE-compressed weights: two interleaved machines; even-indexed
        weights ride state1, odd state2; the last weight is emitted on the
        decoder's overread break (no update field written for the
        second-to-last emission)."""
        ws = self.explicit
        assert len(ws) >= 2
        m = FseWalk(probs, log)
        e1, e2 = ws[0::2], ws[1::2]
        s1, f1 = m.walk(e1)
        s2, f2 = m.walk(e2)
        # the break must really overread: the machine that emits weight
        # k-2 must need >= 1 bit for its (unwritten) final update
        k = len(ws)

        def final_state(init, fields):
            st = init
            for bits_v, _nb in fields:
                st = m.base[st] + bits_v
            return st

        brk_state = final_state(s1, f1) if (k - 2) % 2 == 0 else final_state(s2, f2)
        assert m.nb[brk_state] >= 1, "pick a distribution without 0-bit states"
        w = BackWriter()
        w.put(s1, log)
        w.put(s2, log)
        # updates for emissions 0 .. k-3, interleaved by emission index
        for i in range(len(ws) - 2):
            machine_fields = f1 if i % 2 == 0 else f2
            w.put(*machine_fields[i // 2])
        payload = write_fse_description(probs, log) + w.bytes()
        assert len(payload) < 128
        return bytes([len(payload)]) + payload


def literals_compressed(data: bytes, huf: HufCode, four: bool,
                        tree: bytes | None) -> bytes:
    """Huffman literals section (type 2 with tree, type 3 treeless)."""
    regen = len(data)
    if four:
        part = (regen + 3) // 4
        chunks = [data[:part], data[part:2 * part], data[2 * part:3 * part],
                  data[3 * part:]]
        streams = [huf.encode_stream(c) for c in chunks]
        body = struct.pack("<HHH", len(streams[0]), len(streams[1]),
                           len(streams[2])) + b"".join(streams)
    else:
        body = huf.encode_stream(data)
    if tree is not None:
        body = tree + body
        lb_type = 2
    else:
        lb_type = 3
    comp = len(body)
    if not four:
        size_fmt = 0
    elif regen < 1024 and comp < 1024:
        size_fmt = 1
    elif regen < (1 << 14) and comp < (1 << 14):
        size_fmt = 2
    else:
        size_fmt = 3
    if size_fmt in (0, 1):
        assert regen < 1024 and comp < 1024
        bits = lb_type | (size_fmt << 2) | (regen << 4) | (comp << 14)
        head = bits.to_bytes(3, "little")
    elif size_fmt == 2:
        bits = lb_type | (2 << 2) | (regen << 4) | (comp << 18)
        head = bits.to_bytes(4, "little")
    else:
        bits = lb_type | (3 << 2) | (regen << 4) | (comp << 22)
        head = bits.to_bytes(5, "little")
    return head + body


def literals_raw(data: bytes) -> bytes:
    n = len(data)
    if n < 32:
        return bytes([(n << 3)]) + data
    if n < 4096:
        bits = 0 | (1 << 2) | (n << 4)
        return bits.to_bytes(2, "little") + data
    bits = 0 | (3 << 2) | (n << 4)
    return bits.to_bytes(3, "little") + data


def literals_rle(byte: int, n: int) -> bytes:
    if n < 32:
        return bytes([1 | (n << 3), byte])
    bits = 1 | (1 << 2) | (n << 4)
    return bits.to_bytes(2, "little") + bytes([byte])


# ----------------------------------------------------------------- frame


def frame(blocks: list[tuple[int, bytes | int, int | None]],
          content_size: int | None, checksum: bytes | None = None) -> bytes:
    """Assemble a frame from (block_type, payload, rle_size) entries.
    block_type: 0 raw (payload=bytes), 1 RLE (payload=byte value,
    rle_size=count), 2 compressed (payload=block bytes)."""
    out = bytearray(struct.pack("<I", MAGIC))
    fhd = 0x20  # single segment
    if checksum is not None:
        fhd |= 0x4
    assert content_size is not None
    if content_size < 256:
        out.append(fhd)
        out.append(content_size)
    else:
        out.append(fhd | (1 << 6))  # fcs_flag 1: 2 bytes, value + 256
        out += (content_size - 256).to_bytes(2, "little")
    for k, (btype, payload, rle_n) in enumerate(blocks):
        last = 1 if k == len(blocks) - 1 else 0
        if btype == 0:
            out += (last | (len(payload) << 3)).to_bytes(3, "little")
            out += payload
        elif btype == 1:
            out += (last | 2 | (rle_n << 3)).to_bytes(3, "little")
            out.append(payload)
        else:
            out += (last | 4 | (len(payload) << 3)).to_bytes(3, "little")
            out += payload
    if checksum is not None:
        out += checksum
    return bytes(out)
