"""Pure-Python PDF text extraction (S7 completion, VERDICT r02 #4).

The reference shells out to pdftohtml/pdftotext and OCR-falls-back to
tesseract (/root/reference/ferenda/pdfreader.py:29-916); neither binary
exists in this container, so this is a from-scratch minimal extractor
for the dominant real-world case — Flate-compressed content streams
with Tj/TJ text operators — sufficient for the reference's committed
pdfreader fixtures:

- object scan (``N 0 obj … endobj``), stream decode (FlateDecode/raw)
- page tree traversal in /Kids order (fallback: file order)
- per-font decode maps: /ToUnicode CMap (bfchar + bfrange, 1- or
  2-byte codes, UTF-16BE targets) > /Encoding /Differences (AGL glyph
  names) > StandardEncoding≈cp1252
- content tokenizer: literal strings (nested parens + escapes), hex
  strings, arrays, names; Tf font tracking; Tj/TJ/'/" text emission
  with kern-gap word splitting and Td/TD/Tm/T*/cm line tracking

Out of scope (quarantined or empty, like the reference without its
helper binaries): encrypted PDFs (raise -> quarantine row), scanned
image-only PDFs (no text ops -> empty pages; reference OCRs these),
subsetted fonts with /G<n> glyph names and no ToUnicode (the reference
needs a pdffonts sidecar + learned remap for those too).
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# glyph-name -> char (compact AGL subset: ASCII + latin-1 accents)

_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚",
    "quotedblbase": "„", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "florin": "ƒ", "fraction": "⁄",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "perthousand": "‰", "trademark": "™", "fi": "ﬁ",
    "fl": "ﬂ", "minus": "−", "degree": "°",
    "section": "§", "paragraph": "¶", "sterling": "£",
    "yen": "¥", "cent": "¢", "currency": "¤",
    "copyright": "©", "registered": "®",
    "adieresis": "ä", "aring": "å", "odieresis": "ö",
    "Adieresis": "Ä", "Aring": "Å", "Odieresis": "Ö",
    "udieresis": "ü", "Udieresis": "Ü", "eacute": "é",
    "Eacute": "É", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "ntilde": "ñ", "oslash": "ø",
    "Oslash": "Ø", "ae": "æ", "AE": "Æ",
    "germandbls": "ß", "dotlessi": "ı", "Lslash": "Ł",
    "lslash": "ł", "Zcaron": "Ž", "zcaron": "ž",
    "Scaron": "Š", "scaron": "š", "OE": "Œ",
    "oe": "œ", "Ydieresis": "Ÿ", "ydieresis": "ÿ",
    "exclamdown": "¡", "questiondown": "¿",
}
for _c in range(0x21, 0x7f):
    _AGL.setdefault(chr(_c), chr(_c))       # /a /B /0 … name == char


def _lzw_decode(data: bytes) -> bytes:
    """PDF LZWDecode (TIFF-style LZW, MSB-first variable-width codes,
    256=clear, 257=EOD; PDF 1.7 §7.4.4)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, buf, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("bad lzw code")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.S)
_REF_RE = rb"(\d+)\s+\d+\s+R"
_ENCRYPT_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")
_DICT_OPEN_RE = re.compile(rb"\s*<<")


def _dict_at(data: bytes, pos: int, cap: int = 1 << 20) -> bytes | None:
    """The balanced ``<< ... >>`` dictionary starting at the first
    non-whitespace byte after ``pos``, or None if there isn't one (or
    it never closes within ``cap`` bytes — unclosed dicts mean the
    keyword was data, not structure)."""
    m = _DICT_OPEN_RE.match(data, pos)
    if not m:
        return None
    i, depth, end = m.end(), 1, min(len(data), m.end() + cap)
    while depth and i < end:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return data[m.start():i] if depth == 0 else None


def _is_encrypted(data: bytes) -> bool:
    """/Encrypt is only meaningful inside the trailer dictionary (or
    the cross-reference-stream dict startxref points at).  The probe
    parses the BALANCED ``<< >>`` dict that must immediately follow
    the trailer keyword — no fixed byte window, so a trailer dict of
    any length is covered and an /Encrypt ref merely NEAR a stray
    'trailer' token (ADVICE r04) no longer false-positives."""
    for m in re.finditer(rb"trailer\b", data):
        d = _dict_at(data, m.end())
        if d is not None and _ENCRYPT_RE.search(d):
            return True
    # the spec allows %%EOF within the last 1024 bytes; scan a 2 KB
    # tail for the LAST startxref
    tail = data[-2048:]
    matches = list(re.finditer(rb"startxref\s+(\d+)", tail))
    if matches:  # xref-stream PDFs carry the trailer keys in the dict
        at = data[int(matches[-1].group(1)):]
        m = re.match(rb"\s*\d+\s+\d+\s+obj\b", at)
        if m:
            # probe the xref-stream object's DICT only, never the
            # stream payload
            d = _dict_at(at, m.end())
            if d is not None and _ENCRYPT_RE.search(d):
                return True
    return False


class _Pdf:
    def __init__(self, data: bytes):
        if _is_encrypted(data):
            raise ValueError("encrypted pdf")
        self.objs: dict[int, bytes] = {}
        gens: dict[int, int] = {}
        for m in _OBJ_RE.finditer(data):
            num, gen = int(m.group(1)), int(m.group(2))
            # incremental updates append the live object LATER in the
            # file; among equal offsets the higher generation wins, so
            # keep the last-seen object of the highest generation
            if gen >= gens.get(num, -1):
                gens[num] = gen
                self.objs[num] = m.group(3)

    def body(self, num: int) -> bytes:
        return self.objs.get(num, b"")

    def stream(self, num: int) -> bytes:
        body = self.body(num)
        m = _STREAM_RE.search(body)
        if not m:
            return b""
        raw = m.group(1)
        head = body.split(b"stream", 1)[0]
        if b"/FlateDecode" in head:
            try:
                return zlib.decompress(raw)
            except Exception:
                return b""
        if b"/LZWDecode" in head:
            try:
                return _lzw_decode(raw)
            except Exception:
                return b""
        return raw

    def ref(self, body: bytes, key: bytes) -> int | None:
        m = re.search(key + rb"\s+" + _REF_RE, body)
        return int(m.group(1)) if m else None

    def refs(self, body: bytes, key: bytes) -> list[int]:
        """Single ref or array of refs under ``key``."""
        one = self.ref(body, key)
        m = re.search(key + rb"\s*\[(.*?)\]", body, re.S)
        if m:
            return [int(r.group(1)) for r in
                    re.finditer(_REF_RE, m.group(1))]
        return [one] if one is not None else []

    # -- page tree ---------------------------------------------------------

    def page_objects(self) -> list[int]:
        """Page object numbers in /Kids order; fallback file order."""
        root = None
        for num, body in self.objs.items():
            if b"/Type" in body and b"/Catalog" in body:
                root = self.ref(body, rb"/Pages")
                break
        pages: list[int] = []

        def walk(num: int, depth: int = 0):
            if depth > 64:
                return
            body = self.body(num)
            if re.search(rb"/Type\s*/Page(?![s/\w])", body):
                pages.append(num)
            else:
                for kid in self.refs(body, rb"/Kids"):
                    walk(kid, depth + 1)

        if root is not None:
            walk(root)
        if not pages:
            pages = [n for n, b in sorted(self.objs.items())
                     if re.search(rb"/Type\s*/Page(?![s/\w])", b)]
        return pages

    # -- fonts -------------------------------------------------------------

    def fonts_for_page(self, page_num: int) -> dict[bytes, "_Font"]:
        body = self.body(page_num)
        res = body
        rnum = self.ref(body, rb"/Resources")
        if rnum is not None:
            res = self.body(rnum)
        m = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
        if not m:
            return {}
        out = {}
        for fm in re.finditer(rb"/(\w+)\s+" + _REF_RE, m.group(1)):
            out[b"/" + fm.group(1)] = self._font(int(fm.group(2)))
        return out

    def _font(self, num: int) -> "_Font":
        body = self.body(num)
        f = _Font()
        tu = self.ref(body, rb"/ToUnicode")
        if tu is not None:
            f.cmap, f.code_bytes = _parse_cmap(self.stream(tu))
        enc = self.ref(body, rb"/Encoding")
        enc_body = self.body(enc) if enc is not None else body
        m = re.search(rb"/Differences\s*\[(.*?)\]", enc_body, re.S)
        if m:
            f.diff = _parse_differences(m.group(1))
            names = re.findall(rb"/([^\s/\[\]<>()]+)", m.group(1))
            # a Differences table of subset /G<n> glyph names carries
            # no unicode info: apply the reference's OffsetDecoder1d
            # contract for Regeringskansliet custom encodings
            if names and sum(
                    bool(re.fullmatch(rb"G\d+", n)) for n in names) \
                    > len(names) // 2:
                f.offset1d = True
        return f


# net effect of the reference's OffsetDecoder1d.encodingmap()
# (sources/legal/se/decoders.py:11-38 — "most PDFs with custom encoding
# coming from Regeringskansliet"): codes 0x03-0x60 are ASCII shifted by
# 0x1d, codes 0x61-0x84 are cp1252 high chars shifted by 0x7a.
_OFFSET_1D = {k: chr(k + 0x1d) for k in range(0x03, 0x61)}
_OFFSET_1D.update({k: _ch for k in range(0x61, 0x85)
                   if (_ch := bytes([k + 0x7a]).decode("cp1252", "ignore"))})


class _Font:
    __slots__ = ("cmap", "code_bytes", "diff", "offset1d")

    def __init__(self):
        self.cmap: dict[int, str] | None = None
        self.code_bytes = 1
        self.diff: dict[int, str] | None = None
        self.offset1d = False     # subset /G<n> glyphs, no ToUnicode

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            n = self.code_bytes
            out = []
            for i in range(0, len(raw) - n + 1, n):
                code = int.from_bytes(raw[i:i + n], "big")
                out.append(self.cmap.get(code, ""))
            return "".join(out)
        if self.offset1d:
            return "".join(_OFFSET_1D.get(b, "") for b in raw)
        if self.diff is not None:
            return "".join(
                self.diff.get(b) or _cp1252(b) for b in raw)
        return "".join(_cp1252(b) for b in raw)


def _cp1252(b: int) -> str:
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return ""


def _parse_differences(body: bytes) -> dict[int, str]:
    """/Differences [ code /name /name code /name … ] -> code->char.
    Unmappable names (e.g. subset /G123 glyphs) map to '' — the
    reference needs a pdffonts sidecar for those too."""
    out: dict[int, str] = {}
    code = 0
    for tok in re.finditer(rb"(\d+)|/([^\s/\[\]<>()]+)", body):
        if tok.group(1) is not None:
            code = int(tok.group(1))
        else:
            name = tok.group(2).decode("latin-1")
            out[code] = _AGL.get(name, "")
            code += 1
    return out


# hex strings may contain whitespace INSIDE the brackets
# (e.g. sample.pdf's space glyph: <29> <0009 000d 0020 00a0>)
_HEX = rb"<([0-9A-Fa-f \t\r\n]+)>"


def _parse_cmap(stream: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap -> (code->str, code byte width)."""
    cmap: dict[int, str] = {}
    width = 1

    def clean(hexs: bytes) -> bytes:
        return re.sub(rb"\s", b"", hexs)

    def utf16(hexs: bytes) -> str:
        hexs = clean(hexs)
        try:
            return bytes.fromhex(hexs.decode("ascii")).decode(
                "utf-16-be", "ignore")
        except ValueError:
            return ""

    widths = set()
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", stream, re.S):
        for e in re.finditer(_HEX + rb"\s*" + _HEX, m.group(1)):
            src = clean(e.group(1))
            widths.add(len(src) // 2)
            cmap[int(src, 16)] = utf16(e.group(2))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", stream, re.S):
        body = m.group(1)
        for e in re.finditer(
                _HEX + rb"\s*" + _HEX + rb"\s*" + _HEX, body):
            lo, hi = int(clean(e.group(1)), 16), int(clean(e.group(2)), 16)
            widths.add(len(clean(e.group(1))) // 2)
            dst = clean(e.group(3))
            base = int(dst, 16)
            for c in range(lo, hi + 1):
                cmap[c] = utf16(b"%0*x" % (len(dst), base + (c - lo)))
        for e in re.finditer(
                _HEX + rb"\s*" + _HEX + rb"\s*\[(.*?)\]", body, re.S):
            lo = int(clean(e.group(1)), 16)
            widths.add(len(clean(e.group(1))) // 2)
            for i, d in enumerate(re.finditer(_HEX, e.group(3))):
                cmap[lo + i] = utf16(d.group(1))
    if widths:
        width = max(widths)
    return cmap, width


# ---------------------------------------------------------------------------
# content-stream tokenizer

def _tokens(data: bytes):
    """Yield ('str', bytes) | ('hex', bytes) | ('name', bytes) |
    ('num', float) | ('op', bytes) | ('[', None) | (']', None)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i:i + 1]
        if c in b" \t\r\n\x0c\x00":
            i += 1
        elif c == b"(":
            j, depth, out = i + 1, 1, bytearray()
            while j < n and depth:
                ch = data[j]
                if ch == 0x5c and j + 1 < n:          # backslash escape
                    nxt = data[j + 1]
                    esc = {0x6e: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                           0x66: 12}.get(nxt)
                    if esc is not None:
                        out.append(esc)
                        j += 2
                    elif 0x30 <= nxt <= 0x37:         # octal
                        k = j + 1
                        oct_ = 0
                        while k < n and k < j + 4 and 0x30 <= data[k] <= 0x37:
                            oct_ = oct_ * 8 + (data[k] - 0x30)
                            k += 1
                        out.append(oct_ & 0xFF)
                        j = k
                    elif nxt in (10, 13):             # line continuation
                        j += 2
                    else:                             # \( \) \\ etc.
                        out.append(nxt)
                        j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                out.append(ch)
                j += 1
            yield ("str", bytes(out))
            i = j
        elif c == b"<" and data[i + 1:i + 2] != b"<":
            j = data.find(b">", i)
            if j < 0:
                break
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("hex", bytes.fromhex(hexs.decode("ascii")))
            i = j + 1
        elif data[i:i + 2] == b"<<":
            depth, j = 1, i + 2                      # skip inline dicts
            while j < n - 1 and depth:
                if data[j:j + 2] == b"<<":
                    depth += 1
                    j += 2
                elif data[j:j + 2] == b">>":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            i = j
        elif c == b"[":
            yield ("[", None)
            i += 1
        elif c == b"]":
            yield ("]", None)
            i += 1
        elif c == b"/":
            m = re.match(rb"/[^\s/<>()\[\]{}%]*", data[i:])
            yield ("name", m.group(0))
            i += m.end()
        elif c == b"%":
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = re.match(rb"[-+.\d][.\d\-+eE]*|[A-Za-z'\"*]+", data[i:])
            if not m:
                i += 1
                continue
            tok = m.group(0)
            try:
                yield ("num", float(tok))
            except ValueError:
                yield ("op", tok)
            i += m.end()


_KERN_SPACE = -180.0     # TJ adjustment (thousandths) treated as a gap


def _page_text(content: bytes, fonts: dict[bytes, _Font]) -> str:
    """Decode the text-showing operators of one page's content."""
    lines: list[list[str]] = [[]]
    cur: _Font | None = None
    operands: list = []
    in_array: list | None = None
    last_y: list = [None, None]          # [cm-baseline, Tm-baseline]

    def emit(raw: bytes):
        s = (cur.decode(raw) if cur is not None
             else raw.decode("latin-1", "ignore"))
        if s:
            lines[-1].append(s)

    def newline():
        if lines[-1]:
            lines.append([])

    for kind, val in _tokens(content):
        if kind == "[":
            in_array = []
        elif kind == "]":
            operands.append(in_array or [])
            in_array = None
        elif kind in ("str", "hex", "name", "num"):
            (in_array if in_array is not None else operands).append(
                (kind, val))
        else:  # operator
            op = val
            if op == b"Tf" and len(operands) >= 2 \
                    and operands[-2][0] == "name":
                cur = fonts.get(operands[-2][1])
            elif op in (b"Tj", b"'") and operands \
                    and operands[-1][0] in ("str", "hex"):
                if op == b"'":
                    newline()
                emit(operands[-1][1])
            elif op == b'"' and operands \
                    and operands[-1][0] in ("str", "hex"):
                newline()
                emit(operands[-1][1])
            elif op == b"TJ" and operands \
                    and isinstance(operands[-1], list):
                for k, v in operands[-1]:
                    if k in ("str", "hex"):
                        emit(v)
                    elif k == "num" and v <= _KERN_SPACE:
                        lines[-1].append(" ")
            elif op in (b"Td", b"TD") and len(operands) >= 2 \
                    and operands[-1][0] == "num":
                if operands[-1][1] != 0:
                    newline()
            elif op == b"T*":
                newline()
            elif op in (b"Tm", b"cm") and len(operands) >= 6 \
                    and operands[-1][0] == "num":
                # a vertical move = a new output line; same-baseline
                # runs (style changes mid-line) concatenate.  Tm inside
                # BT and cm outside (Quartz's pattern) both carry the
                # baseline in their f operand; track them separately so
                # a constant Tm (e.g. "66 0 0 66 0 0 Tm" every block)
                # never splits a line.
                y = operands[-1][1]
                key = 0 if op == b"cm" else 1
                if last_y[key] is not None and y != last_y[key]:
                    newline()
                last_y[key] = y
            operands = []
    return "\n".join(
        "".join(parts).strip() for parts in lines if parts).strip()


def extract_pdf_pages(data: bytes) -> list[str]:
    """data -> per-page extracted text.  Raises on encrypted input
    (caller quarantines); image-only pages yield ''."""
    pdf = _Pdf(data)
    pages = []
    for num in pdf.page_objects():
        fonts = pdf.fonts_for_page(num)
        content = b"".join(
            pdf.stream(c) for c in pdf.refs(pdf.body(num), rb"/Contents"))
        pages.append(_page_text(content, fonts))
    return pages
