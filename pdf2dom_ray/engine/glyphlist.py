"""Glyph-name → unicode resolution (Adobe Glyph List subset).

Simple fonts with an /Encoding dictionary remap codes to glyph names
via /Differences (PDF 32000 9.6.6); PDFBox resolves those names through
the Adobe Glyph List. This module carries the AGL subset that covers
the overwhelming majority of web-PDF Differences arrays (Latin base +
punctuation + Latin-1 supplements + common symbols) plus the
algorithmic ``uniXXXX`` / ``uXXXX[XX]`` forms.
"""

from __future__ import annotations

__all__ = ["glyph_to_unicode"]

_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    # Latin-1 supplement
    "exclamdown": "¡", "cent": "¢", "sterling": "£", "currency": "¤",
    "yen": "¥", "brokenbar": "¦", "section": "§", "dieresis": "¨",
    "copyright": "©", "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯", "degree": "°",
    "plusminus": "±", "acute": "´", "mu": "µ", "paragraph": "¶",
    "periodcentered": "·", "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â", "Atilde": "Ã",
    "Adieresis": "Ä", "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Egrave": "È", "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Eth": "Ð", "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö", "multiply": "×",
    "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ", "germandbls": "ß",
    "agrave": "à", "aacute": "á", "acircumflex": "â", "atilde": "ã",
    "adieresis": "ä", "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "eth": "ð", "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö", "divide": "÷",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "thorn": "þ", "ydieresis": "ÿ",
    # common symbols / typography
    "bullet": "•", "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "emdash": "—", "endash": "–", "fi": "ﬁ", "fl": "ﬂ",
    "florin": "ƒ", "fraction": "⁄", "guilsinglleft": "‹",
    "guilsinglright": "›", "minus": "−", "perthousand": "‰",
    "quotedblbase": "„", "quotedblleft": "“", "quotedblright": "”",
    "quoteleft": "‘", "quoteright": "’", "quotesinglbase": "‚",
    "trademark": "™", "Euro": "€", "OE": "Œ", "oe": "œ",
    "Scaron": "Š", "scaron": "š", "Ydieresis": "Ÿ", "Zcaron": "Ž",
    "zcaron": "ž", "circumflex": "ˆ", "tilde": "˜",
    "dotlessi": "ı", "lslash": "ł", "Lslash": "Ł",
}
# single letters and digits map to themselves
for _c in ("abcdefghijklmnopqrstuvwxyz"
           "ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
    _AGL[_c] = _c


def glyph_to_unicode(name: str) -> str | None:
    """Resolve a glyph name to its unicode string, or None."""
    u = _AGL.get(name)
    if u is not None:
        return u
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(chr(int(name[i:i + 4], 16))
                           for i in range(3, len(name) - 3, 4)
                           if len(name) - i >= 4) or None
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None
