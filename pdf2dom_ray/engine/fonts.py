"""Font model: core-font metrics, embedded-font table, text decoding.

Replaces PDFBox's PDFont hierarchy plus the reference's ``FontTable``
(`/root/reference/src/main/java/org/fit/pdfdom/FontTable.java:28-303`).

* Width/metric source order: embedded ``/Widths`` array (+FontDescriptor
  CapHeight/Ascent/Descent), else built-in Standard-14 metric tables
  (public Adobe AFM data, reduced to the Latin printable range; Courier
  is fixed-pitch 600).
* ``FontTable`` mirrors the reference's admission rules
  (`PDFBoxTree.java:368-406`): TrueType fonts, Type0 with CIDFontType2
  descendant, and Type1C; dedup by (name, type, subtype)
  (`FontTable.java:258-265`); ``usedName`` allocation via the family
  regex ``([^+^-]*)[+-]([^+]*)`` + ``+``→space and numeric suffixing
  (`FontTable.java:31,77-118`).
* Font payload extraction (`FontTable.java:141-238`): FontFile2 bytes
  pass through (the reference's FontVerter "normalize" is a validation
  no-op for well-formed fonts — normalization of broken TTFs is out of
  scope and degrades to passthrough); Type1 (FontFile) is unsupported
  and yields empty data exactly like the reference
  (`FontTable.java:214-218`); bare-CFF FontFile3 programs are converted
  to WOFF via ``engine.woff`` (OTF wrap + WOFF1 container, mirroring
  the reference's FontVerter path, `FontTable.java:220-238`), degrading
  to empty data on any conversion failure.
"""

from __future__ import annotations

import re

import numpy as np

from .cos import Name, PdfParseError, Stream, float_value, int_value

f32 = np.float32

# process-wide shared fast tables for simple fonts without ToUnicode
_LATIN1_FAST = None

__all__ = ["PdfFont", "FontTable", "FontTableEntry", "load_font"]

# ---------------------------------------------------------------------------
# Standard-14 metrics (public Adobe AFM data; printable ASCII 32..126).
# Only internal consistency matters for byte-identity: the synthetic
# corpus generator uses the same tables.
# ---------------------------------------------------------------------------

_HELV = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
_HELV_BOLD = [
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333,
    584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611, 778, 722, 278,
    556, 722, 611, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 333, 278, 333, 584, 556, 333, 556, 611, 556, 611, 556,
    333, 611, 611, 278, 278, 556, 278, 889, 611, 611, 611, 611, 389, 556,
    333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
]
_TIMES = [
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
    564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
    389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
    722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
    333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
    278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
]


def _widths256(ascii_widths, default):
    w = np.full(256, default, dtype=np.float64)
    w[32:32 + len(ascii_widths)] = ascii_widths
    return w


# family -> (widths[256], cap_height, ascent, descent, bbox_lly, bbox_ury)
_BUILTIN = {
    "Helvetica": (_widths256(_HELV, 556), 718, 718, -207, -225, 931),
    "Helvetica-Bold": (_widths256(_HELV_BOLD, 556), 718, 718, -207, -228, 962),
    "Helvetica-Oblique": (_widths256(_HELV, 556), 718, 718, -207, -225, 931),
    "Helvetica-BoldOblique": (_widths256(_HELV_BOLD, 556), 718, 718, -207, -228, 962),
    "Times-Roman": (_widths256(_TIMES, 500), 662, 683, -217, -218, 898),
    "Times-Bold": (_widths256(_TIMES, 500), 676, 683, -217, -218, 935),
    "Times-Italic": (_widths256(_TIMES, 500), 653, 683, -217, -217, 883),
    "Times-BoldItalic": (_widths256(_TIMES, 500), 669, 683, -217, -218, 921),
    "Courier": (_widths256([600] * 95, 600), 562, 629, -157, -250, 805),
    "Courier-Bold": (_widths256([600] * 95, 600), 562, 629, -157, -250, 805),
    "Courier-Oblique": (_widths256([600] * 95, 600), 562, 629, -157, -250, 805),
    "Courier-BoldOblique": (_widths256([600] * 95, 600), 562, 629, -157, -250, 805),
    "Symbol": (_widths256([600] * 95, 600), 0, 0, 0, -293, 1010),
    "ZapfDingbats": (_widths256([600] * 95, 600), 0, 0, 0, -143, 820),
}


class PdfFont:
    """A font usable by the walker: widths, vertical metrics, decoding."""

    __slots__ = ("name", "pd_type", "subtype", "widths", "cap_height",
                 "ascent", "descent", "bbox_lly", "bbox_ury", "to_unicode",
                 "font_file", "font_file2", "font_file3", "font_file3_subtype",
                 "is_type0", "descendant_is_cid2", "is_type1c", "_fast")

    def __init__(self, name: str):
        self.name = name
        self.pd_type = "Type1"
        self.subtype = "Type1"
        self.widths = _BUILTIN["Helvetica"][0]
        self.cap_height = 718.0
        self.ascent = 718.0
        self.descent = -207.0
        self.bbox_lly = -225.0
        self.bbox_ury = 931.0
        self.to_unicode: dict[int, str] | None = None
        self.font_file: bytes | None = None
        self.font_file2: bytes | None = None
        self.font_file3: bytes | None = None
        self.font_file3_subtype: str | None = None
        self.is_type0 = False
        self.descendant_is_cid2 = False
        self.is_type1c = False
        self._fast = None  # lazy (uni, clean, is_ws) vectorization tables

    # -- decoding ------------------------------------------------------
    def decode(self, b: bytes) -> list[tuple[int, str]]:
        """Decode a PDF string into (code, unicode) glyph pairs."""
        if self.is_type0:
            # Identity-H: 2-byte codes
            codes = [int.from_bytes(b[i:i + 2], "big")
                     for i in range(0, len(b) - len(b) % 2, 2)]
        else:
            codes = list(b)
        tu = self.to_unicode
        if tu is not None:
            return [(c, tu.get(c, "�")) for c in codes]
        if self.is_type0:
            return [(c, "�") for c in codes]
        return [(c, chr(c) if c else "�") for c in codes]

    def fast_tables(self):
        """Per-code vectorization tables: (uni: uint32 codepoints,
        clean: bool, is_ws: bool, rtl: bool), sized to the code space.

        ``clean`` marks codes whose unicode is a single non-combining
        char — a run of only clean codes with UNIFORM directionality
        can take the vectorized box path (walker._show_text_vec);
        anything else falls back to the per-glyph loop. ``is_ws``
        mirrors Java ``trim`` (chars <= U+0020 are dropped glyphs);
        ``rtl`` marks isReversed directionality classes
        (PDFBoxTree.java:686-699).
        """
        if self._fast is None:
            import unicodedata
            n = 65536 if self.is_type0 else 256
            tu = self.to_unicode
            if tu is None and self.is_type0:
                z = np.zeros(n, bool)
                self._fast = (np.zeros(n, np.uint32), z, z, z)
                return self._fast
            if tu is None:
                # font-independent: all simple fonts without ToUnicode
                # share one process-wide table
                global _LATIN1_FAST
                if _LATIN1_FAST is None:
                    _LATIN1_FAST = self._build_fast_tables(
                        ((c, chr(c) if c else "�") for c in range(256)), 256)
                self._fast = _LATIN1_FAST
                return self._fast
            self._fast = self._build_fast_tables(
                ((c, u) for c, u in tu.items() if 0 <= c < n), n)
        return self._fast

    @staticmethod
    def _build_fast_tables(pairs, n: int):
        import unicodedata
        uni = np.zeros(n, dtype=np.uint32)
        clean = np.zeros(n, dtype=bool)
        rtl = np.zeros(n, dtype=bool)
        rtl_classes = {"R", "AL", "RLE", "RLO"}
        for c, u in pairs:
            if len(u) != 1:
                continue
            if unicodedata.category(u) in ("Mn", "Mc", "Me"):
                continue
            uni[c] = ord(u)
            clean[c] = True
            if unicodedata.bidirectional(u) in rtl_classes:
                rtl[c] = True
        is_ws = clean & (uni <= 0x20)
        return (uni, clean, is_ws, rtl)

    def width(self, code: int) -> float:
        return float(self.widths[code]) if 0 <= code < len(self.widths) else 0.0

    def widths_for(self, codes) -> np.ndarray:
        codes = np.asarray(codes, dtype=np.int64)
        clipped = np.clip(codes, 0, len(self.widths) - 1)
        w = self.widths[clipped]
        return np.where((codes >= 0) & (codes < len(self.widths)), w, 0.0)


def _parse_to_unicode(stream_data: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap's bfchar/bfrange sections (minimal)."""
    out: dict[int, str] = {}
    txt = stream_data

    def hex2cp(h: bytes) -> int:
        return int(h, 16)

    def hex2str(h: bytes) -> str:
        raw = bytes.fromhex(h.decode("ascii"))
        if len(raw) % 2 == 0 and len(raw) >= 2:
            return raw.decode("utf-16-be", errors="replace")
        return raw.decode("latin-1")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", txt, re.S):
        for pm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            out[hex2cp(pm.group(1))] = hex2str(pm.group(2))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", txt, re.S):
        for pm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                m.group(1)):
            lo, hi = hex2cp(pm.group(1)), hex2cp(pm.group(2))
            base = hex2cp(pm.group(3))
            width = len(pm.group(3))
            for i in range(min(hi - lo + 1, 65536)):
                out[lo + i] = hex2str(b"%0*X" % (width, base + i))
    return out


def load_font(doc, font_dict: dict) -> PdfFont:
    """Build a PdfFont from a /Font resource dictionary."""
    d = doc.resolve(font_dict)
    if not isinstance(d, dict):
        raise PdfParseError("font resource is not a dict")
    base = d.get("BaseFont")
    subtype = d.get("Subtype")
    name = str(base) if isinstance(base, Name) else (str(base) if base else "Unknown")
    font = PdfFont(name)
    font.subtype = str(subtype) if subtype else "Type1"

    desc_src = d
    if subtype == "Type0":
        font.is_type0 = True
        font.pd_type = "Type0"
        descendants = doc.resolve(d.get("DescendantFonts")) or []
        dd = doc.resolve(descendants[0]) if descendants else {}
        if isinstance(dd, dict):
            font.descendant_is_cid2 = dd.get("Subtype") == "CIDFontType2"
            desc_src = dd
            dw = float_value(doc.resolve(dd.get("DW", 1000)))
            font.widths = np.full(65536, dw if dw else 1000.0, dtype=np.float64)
            w = doc.resolve(dd.get("W"))
            if isinstance(w, list):
                i = 0
                while i < len(w):
                    c = int_value(doc.resolve(w[i]))
                    nxt = doc.resolve(w[i + 1]) if i + 1 < len(w) else None
                    if isinstance(nxt, list):
                        for j, wv in enumerate(nxt):
                            cc = c + j
                            if 0 <= cc < 65536:
                                font.widths[cc] = float_value(doc.resolve(wv))
                        i += 2
                    else:
                        c2 = int_value(nxt)
                        wv = float_value(doc.resolve(w[i + 2])) if i + 2 < len(w) else 0
                        font.widths[max(c, 0):min(c2 + 1, 65536)] = wv
                        i += 3
    else:
        font.pd_type = "TrueType" if subtype == "TrueType" else "Type1"
        if subtype == "Type3":
            font.pd_type = "Type3"

    # simple-font /Widths
    if not font.is_type0:
        fam = name.split("+")[-1]
        builtin = _BUILTIN.get(fam)
        if builtin is not None:
            (font.widths, font.cap_height, font.ascent, font.descent,
             font.bbox_lly, font.bbox_ury) = builtin
        widths = doc.resolve(d.get("Widths"))
        first = int_value(doc.resolve(d.get("FirstChar", 0)))
        if isinstance(widths, list):
            w = np.array(builtin[0] if builtin is not None
                         else np.zeros(256), dtype=np.float64)
            # Type3 widths are in glyph space scaled by /FontMatrix[0]
            # (PDF 32000 9.6.5); normalize to the /1000 convention
            scale = 1.0
            if subtype == "Type3":
                fm = doc.resolve(d.get("FontMatrix"))
                if isinstance(fm, list) and len(fm) == 6:
                    scale = float_value(doc.resolve(fm[0])) * 1000.0
            for j, wv in enumerate(widths):
                c = first + j
                if 0 <= c < 256:
                    w[c] = float_value(doc.resolve(wv)) * scale
            font.widths = w

    # descriptor metrics
    fd = doc.resolve(desc_src.get("FontDescriptor"))
    if isinstance(fd, dict):
        if "CapHeight" in fd:
            font.cap_height = float_value(doc.resolve(fd["CapHeight"]))
        if "Ascent" in fd:
            font.ascent = float_value(doc.resolve(fd["Ascent"]))
        if "Descent" in fd:
            font.descent = float_value(doc.resolve(fd["Descent"]))
        bbox = doc.resolve(fd.get("FontBBox"))
        if isinstance(bbox, list) and len(bbox) == 4:
            font.bbox_lly = float_value(doc.resolve(bbox[1]))
            font.bbox_ury = float_value(doc.resolve(bbox[3]))
        for key, attr in (("FontFile", "font_file"), ("FontFile2", "font_file2"),
                          ("FontFile3", "font_file3")):
            ff = doc.resolve(fd.get(key))
            if isinstance(ff, Stream):
                try:
                    setattr(font, attr, ff.data())
                except PdfParseError:
                    setattr(font, attr, b"")
                if key == "FontFile3":
                    st = ff.dict.get("Subtype")
                    font.font_file3_subtype = str(st) if st else None
        if font.font_file3 is not None and font.font_file3_subtype == "Type1C" \
                and not font.is_type0:
            font.is_type1c = True

    tu = doc.resolve(d.get("ToUnicode"))
    if isinstance(tu, Stream):
        try:
            font.to_unicode = _parse_to_unicode(tu.data())
        except Exception:
            font.to_unicode = None

    # simple-font /Encoding with /Differences (PDF 32000 9.6.6): codes
    # remap to glyph names resolved via the AGL; an explicit ToUnicode
    # CMap takes precedence (spec-ordered source of truth)
    if font.to_unicode is None and not font.is_type0:
        enc = doc.resolve(d.get("Encoding"))
        enc_dict = enc if isinstance(enc, dict) else None
        base_name = str(enc) if isinstance(enc, Name) else (
            str(doc.resolve(enc_dict.get("BaseEncoding")))
            if enc_dict and enc_dict.get("BaseEncoding") else None)
        diffs = doc.resolve(enc_dict.get("Differences")) if enc_dict else None
        if base_name == "WinAnsiEncoding" or isinstance(diffs, list):
            emap = {c: (chr(c) if c else "�") for c in range(256)}
            if base_name == "WinAnsiEncoding":
                emap.update(_WINANSI_HIGH)
            if isinstance(diffs, list):
                from .glyphlist import glyph_to_unicode
                code = 0
                for item in diffs:
                    item = doc.resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, Name):
                        u = glyph_to_unicode(str(item))
                        if u is not None and 0 <= code < 256:
                            emap[code] = u
                        code += 1
            font.to_unicode = emap
    return font


# WinAnsi (CP1252) 0x80–0x9F, where it differs from Latin-1
_WINANSI_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


# ---------------------------------------------------------------------------
# FontTable (embedded-font registry)
# ---------------------------------------------------------------------------

_FONT_FAMILY_RE = re.compile(r"([^+^-]*)[+-]([^+]*)")  # FontTable.java:31


class FontTableEntry:
    """One admitted embedded font (FontTable.Entry, FontTable.java:120-302)."""

    __slots__ = ("font_name", "used_name", "font", "_cached", "mime_type",
                 "file_ending")

    def __init__(self, font_name: str, used_name: str, font: PdfFont):
        self.font_name = font_name
        self.used_name = used_name
        self.font = font
        self._cached: bytes | None = None
        self.mime_type = "x-font-truetype"  # FontTable.java:128
        self.file_ending: str | None = None

    @property
    def name(self) -> str:
        return self.font_name

    def get_data(self) -> bytes:
        # FontTable.java:141-157 dispatch order
        if self._cached is not None:
            return self._cached
        f = self.font
        if f.font_file2 is not None and f.is_type0:
            # Type0→OpenType conversion (FontTable.java:193-212): the
            # descendant TTF program is already an sfnt; normalized
            # like the reference's FontVerter pass.
            from .sfnt import normalize_ttf
            self.mime_type = "application/x-font-truetype"
            self.file_ending = "ttf"
            self._cached = normalize_ttf(f.font_file2)
        elif f.font_file2 is not None:
            # TTF normalize (FontTable.java:172-191): FontVerter-style
            # re-serialize (rebuilt directory/checksums); passthrough
            # only when the data does not parse as an sfnt.
            from .sfnt import normalize_ttf
            self.mime_type = "application/x-font-truetype"
            self.file_ending = "otf"
            self._cached = normalize_ttf(f.font_file2)
        elif f.font_file is not None:
            # Type 1 unsupported (FontTable.java:214-218)
            self._cached = b""
        elif f.font_file3 is not None:
            # bare CFF → OTF wrap → WOFF (FontTable.java:220-238); any
            # conversion failure degrades to empty data like the
            # reference ("html still useable without")
            try:
                from .woff import cff_to_woff
                self._cached = cff_to_woff(f.font_file3)
                self.mime_type = "application/x-font-woff"
                self.file_ending = "woff"
            except Exception:
                self._cached = b""
        else:
            self._cached = b""
        return self._cached

    def is_valid(self) -> bool:
        return len(self.get_data()) > 0

    def get_mime_type(self) -> str:
        return self.mime_type

    def get_file_ending(self) -> str | None:
        return self.file_ending

    def matches(self, font: PdfFont) -> bool:
        # (name, type, subtype) identity — FontTable.java:258-265
        return (font.name == self.font.name and font.pd_type == self.font.pd_type
                and font.subtype == self.font.subtype)


def find_font_family(font_name: str) -> str:
    """`findFontFamily` (FontTable.java:105-118)."""
    m = _FONT_FAMILY_RE.search(font_name)
    family = f"{m.group(1)} {m.group(2)}" if m else font_name
    return family.replace("+", " ")


class FontTable:
    """Per-document embedded-font registry (FontTable.java:28-118)."""

    def __init__(self):
        self.entries: list[FontTableEntry] = []

    def add_entry(self, font: PdfFont) -> None:
        if self.get(font) is not None:
            return
        family = find_font_family(font.name)
        used = self.next_used_name(family)
        entry = FontTableEntry(font.name, used, font)
        if entry.is_valid():
            self.entries.append(entry)

    def get(self, font: PdfFont) -> FontTableEntry | None:
        for e in self.entries:
            if e.matches(font):
                return e
        return None

    def get_used_name(self, font: PdfFont) -> str | None:
        e = self.get(font)
        return e.used_name if e is not None else None

    def next_used_name(self, base: str) -> str:
        i = 1
        used = base
        while self.is_name_used(used):
            used = f"{base}{i}"
            i += 1
        return used

    def is_name_used(self, name: str) -> bool:
        return any(e.used_name == name for e in self.entries)
