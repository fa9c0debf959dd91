"""Dev tool: compare find_sfs_refs against the reference's committed
sfs-basic goldens (URI sequences).  Usage: python tools/sfs_parity.py
[name ...]"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

DIR = "/root/reference/test/files/legalref/SFS"


def load(name: str):
    """-> list of (input_text, [expected_uri, ...]) test sections."""
    data = open(f"{DIR}/{name}", "rb").read()
    try:        # the corpus is mixed: most latin-1, some utf-8 + CRLF
        raw = data.decode("utf-8")
    except UnicodeDecodeError:
        raw = data.decode("iso-8859-1")
    raw = raw.replace("\r\n", "\n")
    # sections separated by a line of exactly '---'
    sections = re.split(r"\n---\n", raw)
    # in multi-section files, inputs come first then all <list> blocks
    inputs, lists = [], []
    for sec in sections:
        if "<list>" in sec:
            head, _, rest = sec.partition("<list>")
            if head.strip():
                inputs.append(head)
            lists.append("<list>" + rest)
        else:
            inputs.append(sec)
    uris = [re.findall(r'<Link uri="([^"]+)"', ls) for ls in lists]
    texts = [t.strip("\n") for t in inputs if t.strip()]
    if not texts and uris:      # empty-input golden (tomstrang)
        texts = [""] * len(uris)
    return list(zip(texts, uris))


def main():
    from ferenda_spark.operators.sfs import find_sfs_refs

    names = sys.argv[1:] or sorted(
        f for f in os.listdir(DIR)
        if f.startswith("sfs-") and f.endswith(".txt"))
    ok = bad = 0
    for name in names:
        try:
            cases = load(name)
        except Exception as e:
            print(f"{name}: LOAD ERR {e}")
            continue
        shared = {}
        for i, (text, want) in enumerate(cases):
            if text.lstrip().startswith("RESET:"):
                shared = {}
            base = (None if text.lstrip().startswith("NOBASE:")
                    else "9999:999")
            got = [r["uri"] for r in find_sfs_refs(text, base_law=base,
                                                   law_names=shared)]
            if got == want:
                ok += 1
                print(f"{name}[{i}]: OK ({len(want)} links)")
            else:
                bad += 1
                print(f"{name}[{i}]: MISMATCH")
                print("  want:", want)
                print("  got :", got)
    print(f"\n{ok} ok, {bad} mismatched")


if __name__ == "__main__":
    main()
