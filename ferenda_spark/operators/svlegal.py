"""Swedish legal citation recognizers beyond lagrum (C6 companions),
re-expressed from the reference's LegalRef grammar classes and
validated against its committed goldens (tests/test_reference_parity):

- ``find_rattsfall_refs``  — court case reports (LegalRef.RATTSFALL;
  goldens test/files/legalref/DV): 'NJA 1998 s. 14', 'NJA 2007 not 19',
  'RÅ 1986 ref. 116', 'AD 2008 nr 28' + the malformed in-the-wild
  variants ('MÖD 2006 :18', 'AD 2005-nr 115')
- ``find_forarbete_refs``  — legislative preparatory works
  (LegalRef.FORARBETEN; goldens legalref/Regpubl): prop./bet./rskr./
  SOU/Ds with page references and enumerations, 'a. prop.' anaphora,
  and raw CELEX numbers (incl. short pre-1999 forms)
- ``find_avg_refs``        — agency decisions by diary number
  (LegalRef.MYNDIGHETSBESLUT; goldens legalref/Avg): JK/JO/ARN dnr,
  myndighet resolved from the surrounding mention, ISO dates excluded

All emit {span, uri} rows in textual order (lagen.nu URI space, like
the goldens).  Per-document kernels, same execution model as
operators/sfs.py.
"""

from __future__ import annotations

import re

BASE = "https://lagen.nu/"

# --- rättsfall (DV) --------------------------------------------------------
_RF_SLUG = {"NJA": "nja", "HFD": "hfd", "RÅ": "ra", "MIG": "mig",
            "AD": "ad", "MD": "md", "MÖD": "mod", "RH": "rh"}

_RF_NOT = re.compile(
    r"\b(NJA|HFD|RÅ|MIG)\s+(\d{4})\s+not\.?\s*(\d+)")
_RF_SID = re.compile(r"\b(NJA)\s+(\d{4})\s+s\.?\s*(\d+)")
_RF_REF = re.compile(r"\b(RÅ|HFD)\s+(\d{4})\s+ref\.?\s*(\d+)")
# in-the-wild separators: 'nr 28', '-nr 115', '-73', ': 48', ' :18'
_RF_GEN = re.compile(
    r"\b(AD|MD|MÖD|RH)\s+(\d{4})\s*[:\-]?\s*(?:nr\.?\s*)?-?\s*(\d+)")


def find_rattsfall_refs(text: str) -> list[dict]:
    spans: list[tuple[int, int, dict]] = []
    taken: list[tuple[int, int]] = []

    def free(s, e):
        return all(e <= ts or s >= te for ts, te in taken)

    def add(m, uri):
        if free(m.start(), m.end()):
            spans.append((m.start(), m.end(),
                          {"span": m.group(0), "uri": uri}))
            taken.append((m.start(), m.end()))

    for m in _RF_NOT.finditer(text):
        add(m, f"{BASE}rf/{_RF_SLUG[m.group(1)]}/{m.group(2)}"
               f"/not/{int(m.group(3))}")
    for m in _RF_SID.finditer(text):
        add(m, f"{BASE}rf/nja/{m.group(2)}s{int(m.group(3))}")
    for m in _RF_REF.finditer(text):
        add(m, f"{BASE}rf/{_RF_SLUG[m.group(1)]}/{m.group(2)}"
               f":{int(m.group(3))}")
    for m in _RF_GEN.finditer(text):
        add(m, f"{BASE}rf/{_RF_SLUG[m.group(1)]}/{m.group(2)}"
               f":{int(m.group(3))}")
    spans.sort(key=lambda t: t[0])
    return [d for _, _, d in spans]


# --- förarbeten (Regpubl) --------------------------------------------------
_FB_DOC = re.compile(
    r"""(?:(?P<prop>[Pp]rop\.)\s*(?P<propid>\d{4}/\d{2,4}:\d+)
      | (?P<aprop>a\.\s*prop\.)
      | (?P<bet>bet\.)\s*(?P<betid>\d{4}/\d{2,4}:\w+)
      | (?P<rskr>rskr\.)\s*(?P<rskrid>\d{4}/\d{2,4}:\d+)
      | (?P<sou>SOU)\s+(?P<souid>\d{4}:\d+)
      | (?P<ds>Ds)\s+(?P<dsid>\d{4}:\d+)
      )""",
    re.VERBOSE,
)
# page list directly after a doc: ', s. 51 och 62' / ', s. 112-121, 141-142'
_FB_PAGES = re.compile(r"\s*,?\s*s\.\s*(\d+)")
_FB_MOREPAGES = re.compile(r"\s*(?:-|–|,|och)\s*(\d+)")
_CELEX = re.compile(r"\b(3?)(\d{2}|\d{4})([LR])(\d{4})\b")
# 'avsnitt 8.2.2 [och 12.2.8 ...] [i kommitténs betänkande]' — section
# references within the document under discussion (BASE: context)
_AVSNITT = re.compile(
    r"avsnitt\s+(\d[\d.]*)((?:\s*(?:,|och)\s*\d[\d.]*)*)")
_AVSNITT_MORE = re.compile(r"\d[\d.]*")
_AVSNITT_KB = re.compile(r"\s*i\s+kommitténs\s+betänkande")


def find_forarbete_refs(text: str,
                        base_ctx: dict | None = None) -> list[dict]:
    """``base_ctx`` mirrors the goldens' BASE: marker: the document
    under discussion ({'year','no','kommittensbetankande'}) that
    'avsnitt N.N' / '... i kommitténs betänkande' resolve against."""
    out: list[tuple[int, dict]] = []
    last_prop: str | None = None
    if base_ctx:
        doc_uri = f"{BASE}prop/{base_ctx['year']}:{base_ctx['no']}"
        kb_uri = (f"{BASE}utr/sou/{base_ctx['kommittensbetankande']}"
                  if base_ctx.get("kommittensbetankande") else None)
        for m in _AVSNITT.finditer(text):
            nums = [m.group(1).rstrip(".")]
            nums += [x.rstrip(".")
                     for x in _AVSNITT_MORE.findall(m.group(2) or "")]
            target = (kb_uri if kb_uri
                      and _AVSNITT_KB.match(text, m.end()) else doc_uri)
            for i, n in enumerate(nums):
                out.append((m.start() + i, {"span": n,
                                            "uri": f"{target}#S{n}"}))
    pos = 0
    while m := _FB_DOC.search(text, pos):
        if m.group("prop"):
            doc = BASE + "prop/" + m.group("propid")
            last_prop = doc
        elif m.group("aprop"):
            if last_prop is None:
                pos = m.end()
                continue
            doc = last_prop
        elif m.group("bet"):
            doc = BASE + "bet/" + m.group("betid")
        elif m.group("rskr"):
            doc = BASE + "rskr/" + m.group("rskrid")
        elif m.group("sou"):
            doc = BASE + "utr/sou/" + m.group("souid")
        else:
            doc = BASE + "utr/ds/" + m.group("dsid")
        end = m.end()
        pm = _FB_PAGES.match(text, end)
        if pm:
            out.append((m.start(), {"span": text[m.start():pm.end()],
                                    "uri": f"{doc}#sid{pm.group(1)}"}))
            end = pm.end()
            while nm := _FB_MOREPAGES.match(text, end):
                out.append((nm.start(1), {"span": nm.group(1),
                                          "uri": f"{doc}#sid{nm.group(1)}"}))
                end = nm.end()
        else:
            out.append((m.start(), {"span": m.group(0), "uri": doc}))
        pos = end
    for m in _CELEX.finditer(text):
        year = m.group(2)
        if len(year) == 2:      # short pre-1999 form: 392L0100
            year = "19" + year
        out.append((m.start(), {"span": m.group(0),
                                "uri": f"{BASE}ext/celex/3{year}"
                                       f"{m.group(3)}{m.group(4)}"}))
    out.sort(key=lambda t: t[0])
    return [d for _, d in out]


# --- myndighetsbeslut (Avg) ------------------------------------------------
_AVG_MARK = re.compile(
    r"\b(?:(?P<jo>JO)|(?P<jk>JK|Justitiekanslern?s?)"
    r"|(?P<arn>ARN|[Nn]ämnden))\b")
_DNR3 = re.compile(r"(?<![\d-])(\d{3,4}-\d{2}-\d{2})(?![\d-])")
_DNR2 = re.compile(r"(?<![\d-])(\d{3,4}-\d{4})(?![\d-])")


def _is_iso_date(s: str) -> bool:
    parts = s.split("-")
    return (len(parts) == 3 and len(parts[0]) == 4
            and int(parts[1]) <= 12 and int(parts[2]) <= 31)


def find_avg_refs(text: str) -> list[dict]:
    marks = [(m.start(), next(k for k in ("jo", "jk", "arn")
                              if m.group(k)))
             for m in _AVG_MARK.finditer(text)]

    def myndighet_at(pos: int) -> str | None:
        cur = None
        for s, k in marks:
            if s > pos:
                break
            cur = k
        return cur

    spans: list[tuple[int, int, dict]] = []
    taken: list[tuple[int, int]] = []

    def free(s, e):
        return all(e <= ts or s >= te for ts, te in taken)

    for m in _DNR3.finditer(text):
        who = myndighet_at(m.start())
        if who == "jk" and not _is_iso_date(m.group(1)):
            spans.append((m.start(), m.end(),
                          {"span": m.group(1),
                           "uri": f"{BASE}avg/jk/{m.group(1)}"}))
            taken.append((m.start(), m.end()))
    for m in _DNR2.finditer(text):
        who = myndighet_at(m.start())
        if who in ("jo", "arn") and free(m.start(), m.end()):
            spans.append((m.start(), m.end(),
                          {"span": m.group(1),
                           "uri": f"{BASE}avg/{who}/{m.group(1)}"}))
            taken.append((m.start(), m.end()))
    spans.sort(key=lambda t: t[0])
    return [d for _, _, d in spans]
