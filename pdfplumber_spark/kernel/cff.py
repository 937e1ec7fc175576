"""From-scratch CFF (Compact Font Format / Type1C) parser + Type 2
charstring interpreter for embedded /FontFile3 glyph rendering.

Built from the public Adobe specs only: CFF = Adobe TN #5176, Type 2
charstrings = Adobe TN #5177.  The reference (pdfplumber display.py)
renders glyphs via pypdfium2; this engine rasterizes outlines itself
(kernel/truetype.py rasterize_glyph), so ``CFFFont`` exposes the same
duck-typed surface as ``TrueTypeFont``:

- ``units_per_em`` (from FontMatrix, typically 1000)
- ``descender``   (None -> rasterizer default of -0.2 em)
- ``glyph_id(codepoint) -> Optional[int]``
- ``glyph_outline(gid) -> [[(x, y, on_curve), ...], ...]``

Outlines are cubic Beziers; the interpreter flattens them to all
on-curve polylines so the TrueType quadratic flattener passes them
through unchanged.

CID-keyed CFFs (ROS present) parse fully — FDArray/FDSelect route each
glyph to its own Private DICT/subrs — but ``glyph_id`` returns None for
them (text->CID needs the PDF CMap, which the render path doesn't
carry); renders fall back to bitmap glyphs.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

__all__ = ["CFFError", "CFFFont", "STANDARD_STRINGS"]


class CFFError(Exception):
    pass


# Adobe TN #5176 Appendix A — the 391 predefined strings (SID 0-390).
# Only the text-relevant first 229 need real names for unicode lookup;
# the expert-set tail is kept verbatim for charset round-trips.
STANDARD_STRINGS: Tuple[str, ...] = tuple(
    """.notdef space exclam quotedbl numbersign dollar percent ampersand
    quoteright parenleft parenright asterisk plus comma hyphen period
    slash zero one two three four five six seven eight nine colon
    semicolon less equal greater question at A B C D E F G H I J K L M N
    O P Q R S T U V W X Y Z bracketleft backslash bracketright
    asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q r
    s t u v w x y z braceleft bar braceright asciitilde exclamdown cent
    sterling fraction yen florin section currency quotesingle
    quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash
    dagger daggerdbl periodcentered paragraph bullet quotesinglbase
    quotedblbase quotedblright guillemotright ellipsis perthousand
    questiondown grave acute circumflex tilde macron breve dotaccent
    dieresis ring cedilla hungarumlaut ogonek caron emdash AE
    ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash
    oe germandbls onesuperior logicalnot mu trademark Eth onehalf
    plusminus Thorn onequarter divide brokenbar degree thorn
    threequarters twosuperior registered minus eth multiply
    threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring
    Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute
    Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis
    Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute
    Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde
    ccedilla eacute ecircumflex edieresis egrave iacute icircumflex
    idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde
    scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron
    exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior
    ampersandsmall Acutesmall parenleftsuperior parenrightsuperior
    twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle
    threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle
    eightoldstyle nineoldstyle commasuperior
    threequartersemdash periodsuperior questionsmall asuperior bsuperior
    centsuperior dsuperior esuperior isuperior lsuperior msuperior
    nsuperior osuperior rsuperior ssuperior tsuperior ff ffi ffl
    parenleftinferior parenrightinferior Circumflexsmall hyphensuperior
    Gravesmall Asmall Bsmall Csmall Dsmall Esmall Fsmall Gsmall Hsmall
    Ismall Jsmall Ksmall Lsmall Msmall Nsmall Osmall Psmall Qsmall
    Rsmall Ssmall Tsmall Usmall Vsmall Wsmall Xsmall Ysmall Zsmall
    colonmonetary onefitted rupiah Tildesmall exclamdownsmall
    centoldstyle Lslashsmall Scaronsmall Zcaronsmall Dieresissmall
    Brevesmall Caronsmall Dotaccentsmall Macronsmall figuredash
    hypheninferior Ogoneksmall Ringsmall Cedillasmall questiondownsmall
    oneeighth threeeighths fiveeighths seveneighths onethird twothirds
    zerosuperior foursuperior fivesuperior sixsuperior sevensuperior
    eightsuperior ninesuperior zeroinferior oneinferior twoinferior
    threeinferior fourinferior fiveinferior sixinferior seveninferior
    eightinferior nineinferior centinferior dollarinferior
    periodinferior commainferior Agravesmall Aacutesmall
    Acircumflexsmall Atildesmall Adieresissmall Aringsmall AEsmall
    Ccedillasmall Egravesmall Eacutesmall Ecircumflexsmall
    Edieresissmall Igravesmall Iacutesmall Icircumflexsmall
    Idieresissmall Ethsmall Ntildesmall Ogravesmall Oacutesmall
    Ocircumflexsmall Otildesmall Odieresissmall OEsmall Oslashsmall
    Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall Yacutesmall
    Thornsmall Ydieresissmall 001.000 001.001 001.002 001.003 Black
    Bold Book Light Medium Regular Roman Semibold""".split()
)
assert len(STANDARD_STRINGS) == 391

# TN #5176 Appendix B — Standard Encoding code->SID (nonzero entries),
# needed for the predefined Encoding and for seac accent composition.
_STD_ENCODING: Dict[int, int] = {}
for _code, _sid in zip(range(32, 127), range(1, 96)):
    _STD_ENCODING[_code] = _sid
_STD_ENCODING.update({
    161: 96, 162: 97, 163: 98, 164: 99, 165: 100, 166: 101, 167: 102,
    168: 103, 169: 104, 170: 105, 171: 106, 172: 107, 173: 108,
    174: 109, 175: 110, 177: 111, 178: 112, 179: 113, 180: 114,
    182: 115, 183: 116, 184: 117, 185: 118, 186: 119, 187: 120,
    188: 121, 189: 122, 191: 123, 193: 124, 194: 125, 195: 126,
    196: 127, 197: 128, 198: 129, 199: 130, 200: 131, 202: 132,
    203: 133, 205: 134, 206: 135, 207: 136, 208: 137, 225: 138,
    227: 139, 232: 140, 233: 141, 234: 142, 235: 143, 241: 144,
    245: 145, 248: 146, 249: 147, 250: 148, 251: 149,
})


def _read_index(data: bytes, pos: int) -> Tuple[List[bytes], int]:
    """CFF INDEX at ``pos`` -> (items, next_pos)."""
    if pos + 2 > len(data):
        raise CFFError("INDEX past EOF")
    (count,) = struct.unpack(">H", data[pos:pos + 2])
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CFFError(f"bad offSize {off_size}")
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size:pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += (count + 1) * off_size
    base = pos - 1  # offsets are 1-based from the byte before data
    items = []
    for i in range(count):
        a, b = base + offs[i], base + offs[i + 1]
        if not (base < a <= b <= len(data) + 1):
            raise CFFError("INDEX offset out of range")
        items.append(data[a:b])
    return items, base + offs[count]


def _parse_dict(data: bytes) -> Dict[Tuple[int, ...], List[float]]:
    """CFF DICT -> {op_tuple: operands}. op 12 x -> (12, x)."""
    out: Dict[Tuple[int, ...], List[float]] = {}
    stack: List[float] = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                op = (12, data[i + 1])
                i += 2
            else:
                op = (b0,)
                i += 1
            out[op] = stack
            stack = []
        elif b0 == 28:
            stack.append(struct.unpack(">h", data[i + 1:i + 3])[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack(">i", data[i + 1:i + 5])[0])
            i += 5
        elif b0 == 30:  # real: BCD nibbles
            s = ""
            i += 1
            done = False
            while i < n and not done:
                for nib in (data[i] >> 4, data[i] & 15):
                    if nib <= 9:
                        s += chr(48 + nib)
                    elif nib == 10:
                        s += "."
                    elif nib == 11:
                        s += "E"
                    elif nib == 12:
                        s += "E-"
                    elif nib == 14:
                        s += "-"
                    elif nib == 15:
                        done = True
                        break
                i += 1
            try:
                stack.append(float(s or "0"))
            except ValueError:
                stack.append(0.0)
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            raise CFFError(f"bad DICT byte {b0}")
    return out


def _bias(subrs: List[bytes]) -> int:
    n = len(subrs)
    if n < 1240:
        return 107
    if n < 33900:
        return 1131
    return 32768


class CFFFont:
    """Parsed CFF font (bare CFF, or the 'CFF ' table of an OTTO sfnt)."""

    #: cubic-flattening sample count per curve segment
    CURVE_STEPS = 6

    def __init__(self, data: bytes):
        data = bytes(data)
        if data[:4] == b"OTTO":  # OpenType wrapper (/Subtype /OpenType)
            data = self._sfnt_cff(data)
        if len(data) < 4:
            raise CFFError("truncated CFF")
        hdr_size = data[2]
        pos = hdr_size
        self._data = data
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        self.gsubrs, pos = _read_index(data, pos)
        if not top_dicts:
            raise CFFError("no Top DICT")
        top = _parse_dict(top_dicts[0])
        self._strings = strings
        self.is_cid = (12, 30) in top  # ROS
        fm = top.get((12, 7), [0.001, 0, 0, 0.001, 0, 0])
        sx = abs(fm[0]) if fm and fm[0] else 0.001
        self.units_per_em = round(1.0 / sx) if sx else 1000
        self.descender = None  # rasterizer applies its -0.2 em default
        cs_off = top.get((17,))
        if not cs_off:
            raise CFFError("no CharStrings")
        self.charstrings, _ = _read_index(data, int(cs_off[0]))
        self.nglyphs = len(self.charstrings)
        # Private DICT + local subrs (non-CID); CID fonts use FDArray
        self._privates: List[Tuple[Dict, List[bytes]]] = []
        self._fdselect: Optional[List[int]] = None
        if self.is_cid:
            fda_off = top.get((12, 36))
            if fda_off:
                fds, _ = _read_index(data, int(fda_off[0]))
                for fd in fds:
                    self._privates.append(
                        self._load_private(_parse_dict(fd)))
            fds_off = top.get((12, 37))
            if fds_off:
                self._fdselect = self._parse_fdselect(int(fds_off[0]))
        else:
            self._privates.append(self._load_private(top))
        if not self._privates:
            self._privates.append(({}, []))
        self.charset = self._parse_charset(top.get((15,)))
        self._encoding = self._parse_encoding(top.get((16,)))
        self._uni2gid: Optional[Dict[int, int]] = None
        self._cid2gid: Optional[Dict[int, int]] = None
        self._outline_cache: Dict[int, List] = {}

    # -- container plumbing -------------------------------------------

    @staticmethod
    def _sfnt_cff(data: bytes) -> bytes:
        (ntab,) = struct.unpack(">H", data[4:6])
        for i in range(ntab):
            rec = data[12 + 16 * i:28 + 16 * i]
            tag, _ck, off, ln = struct.unpack(">4sIII", rec)
            if tag == b"CFF ":
                return data[off:off + ln]
        raise CFFError("OTTO without CFF table")

    def _load_private(self, d: Dict) -> Tuple[Dict, List[bytes]]:
        pv = d.get((18,))
        if not pv or len(pv) != 2:
            return {}, []
        size, off = int(pv[0]), int(pv[1])
        pd = _parse_dict(self._data[off:off + size])
        subrs: List[bytes] = []
        so = pd.get((19,))
        if so:
            subrs, _ = _read_index(self._data, off + int(so[0]))
        return pd, subrs

    def _parse_fdselect(self, off: int) -> List[int]:
        data = self._data
        fmt = data[off]
        sel = [0] * self.nglyphs
        if fmt == 0:
            for g in range(self.nglyphs):
                sel[g] = data[off + 1 + g]
        elif fmt == 3:
            (nr,) = struct.unpack(">H", data[off + 1:off + 3])
            p = off + 3
            (sentinel,) = struct.unpack(
                ">H", data[p + nr * 3:p + nr * 3 + 2])
            for i in range(nr):
                first, fd = struct.unpack(">HB", data[p:p + 3])
                p += 3
                nxt = (struct.unpack(">H", data[p:p + 2])[0]
                       if i + 1 < nr else sentinel)
                for g in range(first, min(nxt, self.nglyphs)):
                    sel[g] = fd
        return sel

    def _parse_charset(self, off) -> List[int]:
        """gid -> SID (or CID for CID-keyed)."""
        n = self.nglyphs
        if off is None or int(off[0]) in (0, 1, 2):
            # predefined charsets: ISOAdobe is SID==gid for the common
            # case; Expert(1)/ExpertSubset(2) fall back to the same.
            return list(range(n))
        data = self._data
        p = int(off[0])
        fmt = data[p]
        p += 1
        sids = [0]
        if fmt == 0:
            for _ in range(n - 1):
                sids.append(struct.unpack(">H", data[p:p + 2])[0])
                p += 2
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while len(sids) < n:
                first = struct.unpack(">H", data[p:p + 2])[0]
                nleft = (data[p + 2] if fmt == 1 else
                         struct.unpack(">H", data[p + 2:p + 4])[0])
                p += step
                for k in range(nleft + 1):
                    if len(sids) >= n:
                        break
                    sids.append(first + k)
        else:
            return list(range(n))
        return sids

    def _parse_encoding(self, off) -> Dict[int, int]:
        """code -> gid."""
        if self.is_cid:
            return {}
        if off is None or int(off[0]) == 0:  # Standard Encoding
            sid2gid = {sid: g for g, sid in enumerate(self.charset)}
            return {
                code: sid2gid[sid]
                for code, sid in _STD_ENCODING.items() if sid in sid2gid
            }
        if int(off[0]) == 1:  # Expert — rarely text; fall back empty
            return {}
        data = self._data
        p = int(off[0])
        fmt = data[p]
        p += 1
        enc: Dict[int, int] = {}
        if fmt & 0x7F == 0:
            ncodes = data[p]
            p += 1
            for g in range(1, ncodes + 1):
                enc[data[p]] = g
                p += 1
        elif fmt & 0x7F == 1:
            nranges = data[p]
            p += 1
            gid = 1
            for _ in range(nranges):
                first, nleft = data[p], data[p + 1]
                p += 2
                for k in range(nleft + 1):
                    enc[first + k] = gid
                    gid += 1
        if fmt & 0x80:  # supplements
            nsups = data[p]
            p += 1
            sid2gid = {sid: g for g, sid in enumerate(self.charset)}
            for _ in range(nsups):
                code = data[p]
                sid = struct.unpack(">H", data[p + 1:p + 3])[0]
                p += 3
                if sid in sid2gid:
                    enc[code] = sid2gid[sid]
        return enc

    # -- name / unicode lookup ----------------------------------------

    def sid_name(self, sid: int) -> str:
        if sid < 391:
            return STANDARD_STRINGS[sid]
        i = sid - 391
        if i < len(self._strings):
            try:
                return self._strings[i].decode("latin-1")
            except Exception:  # noqa: BLE001
                return ""
        return ""

    def glyph_name(self, gid: int) -> str:
        if self.is_cid or not 0 <= gid < len(self.charset):
            return ""
        return self.sid_name(self.charset[gid])

    def glyph_id(self, codepoint: int) -> Optional[int]:
        """Unicode codepoint -> gid via AGL glyph names (non-CID only)."""
        if self.is_cid:
            return None
        if self._uni2gid is None:
            from .pdfparse import glyphname_to_unicode

            u2g: Dict[int, int] = {}
            for gid in range(self.nglyphs):
                name = self.glyph_name(gid)
                if not name:
                    continue
                u = glyphname_to_unicode(name)
                if u and len(u) == 1:
                    u2g.setdefault(ord(u), gid)
            self._uni2gid = u2g
        return self._uni2gid.get(codepoint)

    def gid_for_cid(self, cid: int) -> Optional[int]:
        """CID -> gid via the charset (CID-keyed fonts map gid->CID)."""
        if self._cid2gid is None:
            c2g: Dict[int, int] = {}
            for g, c in enumerate(self.charset):
                c2g.setdefault(c, g)
            self._cid2gid = c2g
        return self._cid2gid.get(cid)

    # -- Type 2 charstring interpreter --------------------------------

    def _priv_for(self, gid: int) -> Tuple[Dict, List[bytes]]:
        if self._fdselect is not None and gid < len(self._fdselect):
            fd = self._fdselect[gid]
            if fd < len(self._privates):
                return self._privates[fd]
        return self._privates[0]

    def glyph_outline(
        self, gid: int
    ) -> List[List[Tuple[float, float, bool]]]:
        """Flattened contours of ``gid``: all points on-curve, ready for
        the TrueType rasterizer's pass-through."""
        if gid in self._outline_cache:
            return self._outline_cache[gid]
        if not 0 <= gid < self.nglyphs:
            return []
        try:
            contours = self._run_charstring(gid)
        except (CFFError, IndexError, struct.error):
            contours = []
        out = [
            [(x, y, True) for (x, y) in c] for c in contours
            if len(c) >= 3
        ]
        self._outline_cache[gid] = out
        return out

    def _run_charstring(self, gid: int) -> List[List[Tuple[float, float]]]:
        _pd, lsubrs = self._priv_for(gid)
        st = _T2State(self, lsubrs)
        st.execute(self.charstrings[gid])
        st.close_contour()
        if st.seac is not None:
            # Type 2 "endchar seac" accent composition (TN5177 App. C):
            # base + accent glyph, both looked up via Standard Encoding.
            adx, ady, bchar, achar = st.seac
            contours = []
            for code, dx, dy in ((bchar, 0.0, 0.0), (achar, adx, ady)):
                sid = _STD_ENCODING.get(int(code))
                if sid is None:
                    continue
                try:
                    g2 = self.charset.index(sid)
                except ValueError:
                    continue
                for c in self._run_charstring(g2):
                    contours.append([(x + dx, y + dy) for (x, y) in c])
            return contours
        return st.contours


class _T2State:
    """Execution state for one Type 2 charstring."""

    __slots__ = ("font", "lsubrs", "stack", "x", "y", "contours", "cur",
                 "nstems", "width_done", "depth", "seac", "trans", "done")

    MAX_DEPTH = 10

    def __init__(self, font: CFFFont, lsubrs: List[bytes]):
        self.font = font
        self.lsubrs = lsubrs
        self.stack: List[float] = []
        self.x = 0.0
        self.y = 0.0
        self.contours: List[List[Tuple[float, float]]] = []
        self.cur: List[Tuple[float, float]] = []
        self.nstems = 0
        self.width_done = False
        self.depth = 0
        self.seac = None
        self.trans: List[float] = []  # transient array (put/get)
        self.done = False  # endchar seen (terminates nested subrs too)

    # geometry ---------------------------------------------------------

    def close_contour(self):
        if len(self.cur) >= 2:
            self.contours.append(self.cur)
        self.cur = []

    def moveto(self, dx: float, dy: float):
        self.close_contour()
        self.x += dx
        self.y += dy
        self.cur = [(self.x, self.y)]

    def lineto(self, dx: float, dy: float):
        self.x += dx
        self.y += dy
        self.cur.append((self.x, self.y))

    def curveto(self, dxa, dya, dxb, dyb, dxc, dyc):
        x0, y0 = self.x, self.y
        x1, y1 = x0 + dxa, y0 + dya
        x2, y2 = x1 + dxb, y1 + dyb
        x3, y3 = x2 + dxc, y2 + dyc
        steps = CFFFont.CURVE_STEPS
        for s in range(1, steps + 1):
            t = s / steps
            mt = 1.0 - t
            self.cur.append((
                mt * mt * mt * x0 + 3 * mt * mt * t * x1
                + 3 * mt * t * t * x2 + t * t * t * x3,
                mt * mt * mt * y0 + 3 * mt * mt * t * y1
                + 3 * mt * t * t * y2 + t * t * t * y3,
            ))
        self.x, self.y = x3, y3

    # stem/width bookkeeping ------------------------------------------

    def _take_width(self, even_args: int):
        """Drop the optional leading width operand (first stack-clearing
        operator only). ``even_args``: expected arg-count parity/count."""
        if not self.width_done:
            self.width_done = True
            if len(self.stack) > even_args and \
                    (len(self.stack) - even_args) % 2 == 1:
                del self.stack[0]

    def _stems(self):
        if not self.width_done and len(self.stack) % 2 == 1:
            del self.stack[0]
        self.width_done = True
        self.nstems += len(self.stack) // 2
        self.stack = []

    # interpreter ------------------------------------------------------

    def execute(self, code: bytes):  # noqa: C901 — spec-table dispatch
        self.depth += 1
        if self.depth > self.MAX_DEPTH:
            raise CFFError("subr recursion")
        i = 0
        n = len(code)
        while i < n and not self.done:
            b0 = code[i]
            if b0 >= 32 or b0 == 28:
                i = self._push_number(code, i)
                continue
            i += 1
            if b0 in (1, 3, 18, 23):  # h/vstem(hm)
                self._stems()
            elif b0 in (19, 20):  # hintmask / cntrmask
                if self.stack:  # implicit vstem args
                    self._stems()
                self.width_done = True
                i += (self.nstems + 7) // 8
            elif b0 == 21:  # rmoveto
                self._take_width(2)
                if len(self.stack) >= 2:
                    self.moveto(self.stack[-2], self.stack[-1])
                self.stack = []
            elif b0 == 22:  # hmoveto
                self._take_width(1)
                if self.stack:
                    self.moveto(self.stack[-1], 0.0)
                self.stack = []
            elif b0 == 4:  # vmoveto
                self._take_width(1)
                if self.stack:
                    self.moveto(0.0, self.stack[-1])
                self.stack = []
            elif b0 == 5:  # rlineto
                s = self.stack
                for k in range(0, len(s) - 1, 2):
                    self.lineto(s[k], s[k + 1])
                self.stack = []
            elif b0 in (6, 7):  # hlineto / vlineto (alternating)
                horiz = b0 == 6
                for v in self.stack:
                    if horiz:
                        self.lineto(v, 0.0)
                    else:
                        self.lineto(0.0, v)
                    horiz = not horiz
                self.stack = []
            elif b0 == 8:  # rrcurveto
                s = self.stack
                for k in range(0, len(s) - 5, 6):
                    self.curveto(*s[k:k + 6])
                self.stack = []
            elif b0 == 24:  # rcurveline
                s = self.stack
                k = 0
                while len(s) - k >= 8:
                    self.curveto(*s[k:k + 6])
                    k += 6
                if len(s) - k >= 2:
                    self.lineto(s[k], s[k + 1])
                self.stack = []
            elif b0 == 25:  # rlinecurve
                s = self.stack
                k = 0
                while len(s) - k >= 8:
                    self.lineto(s[k], s[k + 1])
                    k += 2
                if len(s) - k >= 6:
                    self.curveto(*s[k:k + 6])
                self.stack = []
            elif b0 == 26:  # vvcurveto
                s = self.stack
                k = 0
                dx1 = 0.0
                if len(s) % 4 == 1:
                    dx1 = s[0]
                    k = 1
                while len(s) - k >= 4:
                    self.curveto(dx1, s[k], s[k + 1], s[k + 2],
                                 0.0, s[k + 3])
                    dx1 = 0.0
                    k += 4
                self.stack = []
            elif b0 == 27:  # hhcurveto
                s = self.stack
                k = 0
                dy1 = 0.0
                if len(s) % 4 == 1:
                    dy1 = s[0]
                    k = 1
                while len(s) - k >= 4:
                    self.curveto(s[k], dy1, s[k + 1], s[k + 2],
                                 s[k + 3], 0.0)
                    dy1 = 0.0
                    k += 4
                self.stack = []
            elif b0 in (30, 31):  # vhcurveto / hvcurveto
                self._alt_curveto(start_horiz=(b0 == 31))
            elif b0 == 10:  # callsubr
                self._call(self.lsubrs)
            elif b0 == 29:  # callgsubr
                self._call(self.font.gsubrs)
            elif b0 == 11:  # return
                self.depth -= 1
                return
            elif b0 == 14:  # endchar
                self._take_width(0 if len(self.stack) != 5 else 4)
                if len(self.stack) >= 4:
                    self.seac = tuple(self.stack[-4:])
                self.stack = []
                self.done = True
                self.depth -= 1
                return
            elif b0 == 12:
                i = self._escape(code, i)
            else:  # reserved — tolerate by clearing
                self.stack = []
        self.depth -= 1

    def _push_number(self, code: bytes, i: int) -> int:
        b0 = code[i]
        if b0 == 28:
            self.stack.append(
                struct.unpack(">h", code[i + 1:i + 3])[0])
            return i + 3
        if b0 <= 246:
            self.stack.append(b0 - 139)
            return i + 1
        if b0 <= 250:
            self.stack.append((b0 - 247) * 256 + code[i + 1] + 108)
            return i + 2
        if b0 <= 254:
            self.stack.append(-(b0 - 251) * 256 - code[i + 1] - 108)
            return i + 2
        # 255: 16.16 fixed
        (v,) = struct.unpack(">i", code[i + 1:i + 5])
        self.stack.append(v / 65536.0)
        return i + 5

    def _call(self, subrs: List[bytes]):
        if not self.stack:
            return
        idx = int(self.stack.pop()) + _bias(subrs)
        if 0 <= idx < len(subrs):
            self.execute(subrs[idx])

    def _alt_curveto(self, start_horiz: bool):
        """vh/hvcurveto: groups of 4 with alternating start tangents;
        the last group may carry a 5th arg = the final point's delta on
        the off-axis (TN5177 hvcurveto/vhcurveto)."""
        s = self.stack
        k = 0
        horiz = start_horiz
        while len(s) - k >= 4:
            rem = len(s) - k
            df = s[k + 4] if rem == 5 else 0.0
            if horiz:
                self.curveto(s[k], 0.0, s[k + 1], s[k + 2], df, s[k + 3])
            else:
                self.curveto(0.0, s[k], s[k + 1], s[k + 2], s[k + 3], df)
            horiz = not horiz
            k += 5 if rem == 5 else 4
        self.stack = []

    def _escape(self, code: bytes, i: int) -> int:  # noqa: C901
        b1 = code[i]
        i += 1
        s = self.stack
        if b1 == 35 and len(s) >= 13:  # flex
            self.curveto(*s[0:6])
            self.curveto(*s[6:12])
            self.stack = []
        elif b1 == 34 and len(s) >= 7:  # hflex
            y0 = self.y
            self.curveto(s[0], 0.0, s[1], s[2], s[3], 0.0)
            self.curveto(s[4], 0.0, s[5], y0 - (self.y), s[6], 0.0)
            self.stack = []
        elif b1 == 36 and len(s) >= 9:  # hflex1
            y_start = self.y
            self.curveto(s[0], s[1], s[2], s[3], s[4], 0.0)
            # dy6 returns the endpoint to y_start: dy5 + dy6 = -(dy1+dy2)
            self.curveto(s[5], 0.0, s[6], s[7], s[8],
                         y_start - self.y - s[7])
            self.stack = []
        elif b1 == 37 and len(s) >= 11:  # flex1
            x_start, y_start = self.x, self.y
            dx = sum(s[k] for k in (0, 2, 4, 6, 8))
            dy = sum(s[k] for k in (1, 3, 5, 7, 9))
            self.curveto(*s[0:6])
            # final point: d6 along the dominant delta, back to the
            # start coordinate on the other axis (TN5177 flex1)
            if abs(dx) > abs(dy):
                self.curveto(s[6], s[7], s[8], s[9], s[10],
                             y_start - self.y - (s[7] + s[9]))
            else:
                self.curveto(s[6], s[7], s[8], s[9],
                             x_start - self.x - (s[6] + s[8]), s[10])
            self.stack = []
        else:
            # arithmetic/storage ops (and/or/put/get/...) are legal but
            # vanishingly rare in real fonts — clear and continue
            self.stack = []
        return i
