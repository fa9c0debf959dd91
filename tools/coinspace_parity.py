"""Dev tool: mint every publ.atom entry through the URISpace and diff
against the committed expected URIs (integrationLegalURI Coinstruct)."""

from __future__ import annotations

import re
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, ".")

SPACE = ("/root/reference/ferenda/sources/legal/se/res/uri/"
         "swedishlegalsource.space.ttl")
SLUGS = ("/root/reference/ferenda/sources/legal/se/res/uri/"
         "swedishlegalsource.slugs.ttl")
ATOM = "/root/reference/test/files/legaluri/publ.atom"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def el_to_resource(el, parent=None) -> dict:
    """RDF/XML element -> {'type', 'props', 'parent'} resource dict."""
    res: dict = {"type": el.tag.replace("{", "").replace("}", ""),
                 "props": {}, "parent": parent}
    about = el.get(f"{{{RDF_NS}}}about")
    if about:
        res["uri"] = about
    for child in el:
        pred = child.tag.replace("{", "").replace("}", "")
        ref = child.get(f"{{{RDF_NS}}}resource")
        subels = list(child)
        if ref is not None:
            val = ref
        elif subels:
            val = el_to_resource(subels[0], parent=(res, pred))
        elif child.text and child.text.strip():
            val = " ".join(child.text.split())
        else:
            continue
        res["props"].setdefault(pred, []).append(val)
    return res


def load_entries(path: str = ATOM):
    raw = open(path).read()
    raw = re.sub(r"<!--.*?-->", "", raw, flags=re.S)  # drop commented-out
    out = []
    for m in re.finditer(r"<entry>(.*?)</entry>", raw, re.S):
        body = m.group(1)
        idm = re.search(r"<id>([^<]+)</id>", body)
        cm = re.search(r'<content type="application/rdf\+xml">(.*?)'
                       r"</content>", body, re.S)
        if not (idm and cm):
            continue
        content = re.sub(r"<!--.*?-->", "", cm.group(1), flags=re.S)
        wrapped = (f'<root xmlns:rdf="{RDF_NS}" '
                   f'xmlns:rpubl="http://rinfo.lagrummet.se/ns/2008/11/'
                   f'rinfo/publ#" '
                   f'xmlns:dct="http://purl.org/dc/terms/" '
                   f'xmlns:foaf="http://xmlns.com/foaf/0.1/" '
                   f'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
                   f"{content}</root>")
        root = ET.fromstring(wrapped)
        out.append((idm.group(1), el_to_resource(root[0])))
    return out


def main():
    from ferenda_spark.operators.coinspace import URISpace

    space = URISpace(open(SPACE).read(), open(SLUGS).read())
    ok = bad = 0
    for want, res in load_entries():
        got = space.coin_uri(res)
        if got == want:
            ok += 1
        else:
            bad += 1
            print(f"MISMATCH type={res['type'].rsplit('#')[-1]}")
            print("  want", want)
            print("  got ", got)
    print(f"\n{ok} ok, {bad} mismatched")


if __name__ == "__main__":
    main()
