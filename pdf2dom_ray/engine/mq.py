"""MQ arithmetic coder (encoder + decoder).

The MQ coder is the shared binary arithmetic-coding primitive of
JBIG2 (ITU-T T.88 Annex E) and JPEG2000 Part 1 (ISO/IEC 15444-1
Annex C) — both standards publish the identical 47-row Qe state table
and the INITDEC/DECODE/BYTEIN and INITENC/ENCODE/BYTEOUT/FLUSH
procedures this module implements.

The reference (radkovo/Pdf2Dom via PDFBox) reaches these codecs
through the JDK image readers (``PDImageXObject.getImage()``,
``PDFBoxTree.java:544-590``); this engine implements them directly.

Verification strategy: this container has no external JBIG2/JPX
codec to cross-check byte streams against, so — exactly like the
engine's JPEG and CCITT codecs — the locked property is
``decode(encode(bits)) == bits`` for the encoder/decoder pair plus
structural known-answer checks on the state table (sum/transition
invariants from the published spec). Interop with external encoders
is therefore untested in-container and documented as such.

Contexts: callers hold an integer array ``cx`` of per-context states,
each state packed as ``index << 1 | mps``. JBIG2 generic regions use
one 2^16 array; JPEG2000 tier-1 uses a 19-entry array.
"""

from __future__ import annotations

__all__ = ["MQDecoder", "MQEncoder", "new_contexts", "QE"]

# (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1 / 15444-1 Table C.2.
QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


def new_contexts(n: int) -> list[int]:
    """Fresh context states (index 0, MPS 0) — one per context label."""
    return [0] * n


class MQDecoder:
    """T.88 §E.3 decoding procedures (DECODE/BYTEIN/INITDEC).

    Reading past the end of ``data`` behaves as if the stream were
    followed by 0xFF bytes (marker-terminated), per both specs.
    """

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        d = self.data
        return d[i] if i < len(d) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: list[int], label: int) -> int:
        """Decode one binary decision in context ``label``."""
        state = cx[label]
        icx = state >> 1
        mps = state & 1
        qe, nmps, nlps, switch = QE[icx]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path (renormalization always happens)
            if self.a < qe:
                d = mps
                cx[label] = (nmps << 1) | mps
            else:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                cx[label] = (nlps << 1) | mps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            # MPS exchange path
            if self.a < qe:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                cx[label] = (nlps << 1) | mps
            else:
                d = mps
                cx[label] = (nmps << 1) | mps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 §E.3 encoding procedures (ENCODE/BYTEOUT/FLUSH)."""

    __slots__ = ("out", "b", "c", "a", "ct", "started")

    def __init__(self):
        self.out = bytearray()
        self.b = 0            # pending byte (valid once started)
        self.started = False  # BP has pointed at a real byte yet?
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def encode(self, cx: list[int], label: int, d: int) -> None:
        state = cx[label]
        icx = state >> 1
        mps = state & 1
        qe, nmps, nlps, switch = QE[icx]
        if d == mps:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[label] = (nmps << 1) | mps
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps = 1 - mps
            cx[label] = (nlps << 1) | mps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _emit(self, shift: int, mask: int, ct: int) -> None:
        if self.started:
            self.out.append(self.b)
        self.started = True
        self.b = (self.c >> shift) & 0xFF
        self.c &= mask
        self.ct = ct

    def _byteout(self) -> None:
        if self.started and self.b == 0xFF:
            self._emit(20, 0xFFFFF, 7)            # stuff
        elif self.c < 0x8000000:
            self._emit(19, 0x7FFFF, 8)            # no carry
        else:
            self.b += 1                            # propagate carry
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit(20, 0xFFFFF, 7)        # stuff after carry
            else:
                self._emit(19, 0x7FFFF, 8)

    def flush(self) -> bytes:
        """FLUSH (T.88 §E.3.8): terminate and return the byte stream."""
        # SETBITS: pick a C' inside the final interval [C, C+A) with
        # maximal trailing one-bits (so the truncated tail the decoder
        # refills with 0xFF still lands inside the interval). Filling
        # the low 16 bits with ones and stepping back 0x8000 if that
        # overshoots is the 15444-1 software-reference formulation; the
        # earlier aligned-floor variant chose values OUTSIDE the
        # interval when C+A-1 straddled a 0x10000 boundary with
        # A == 0x8000, silently corrupting the last 1-2 decisions.
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.started and self.b != 0xFF:
            self.out.append(self.b)
        # trailing 0xFF is discarded per the spec (marker territory)
        return bytes(self.out)
