"""RFC two-column header parse — per-document kernel function.

Reference: RFC.parse_header (/root/reference/ferenda/sources/tech/rfc.py:549-634).
Left column: "Key: Value" headers; right column: creators ("X. Name"),
"Month YYYY" issue dates (-> xsd:gYearMonth), else rightsHolder.
Runs inside the Arrow-batched extract stage; label->URI resolution is
NOT done here — labels are emitted raw and joined against the entity
dictionary with a broadcast join (J1, operators/canonicalize.py).
"""

from __future__ import annotations

import re

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}

_CREATOR_RE = re.compile(r"[A-Z]\. ")
_DATE_RE = re.compile(r"(\w+) (\d{4})$")
_NUM_RE = re.compile(r"\d+")


def parse_rfc_header(header: str) -> dict:
    lines = header.split("\n")
    left = [x.split("   ", 1)[0].strip() for x in lines]
    right = [x.split("   ", 1)[1].strip() for x in lines if "   " in x]

    out: dict = {
        "publisher": left[0] if left else None,
        "identifier": None, "category": None, "issn": None, "issued": None,
        "creators": [], "rightsholders": [], "updates": [], "obsoletes": [],
        "rdftype": None, "bcpnumber": None, "stdnumber": None,
        "fyinumber": None,
    }
    for line in left[1:]:
        if not line.strip() or ": " not in line:
            continue
        key, value = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            num = re.sub(r"\D", "", value)
            if num:
                out["identifier"] = f"RFC {num}"
        elif key == "Category":
            out["category"] = value
        elif key == "ISSN":
            out["issn"] = value
        elif key in ("Updates", "Obsoletes"):
            nums = [m.group(0) for part in value.split(", ")
                    if (m := _NUM_RE.search(part))]
            out["updates" if key == "Updates" else "obsoletes"] = nums
        elif key == "BCP":
            out["bcpnumber"] = value
            out["rdftype"] = "BCP"
        elif key == "STD":
            # the reference assigns rfc:FYI here (rfc.py:606-608);
            # mirrored because its goldens encode that behavior
            out["stdnumber"] = value
            out["rdftype"] = "FYI"
        elif key == "FYI":
            out["fyinumber"] = value
            out["rdftype"] = "FYI"
    for line in right:
        if not line:
            continue
        if _CREATOR_RE.match(line):
            out["creators"].append(line)
        elif (m := _DATE_RE.match(line)) and m.group(1) in _MONTHS:
            out["issued"] = f"{m.group(2)}-{_MONTHS[m.group(1)]:02d}"
        else:
            out["rightsholders"].append(line)
    return out
