"""Per-source ("docrepo") parse configuration — the Spark equivalent of
the reference's DocumentRepository subclasses.  Each alias carries the
declarative knobs the reference exposes as class attributes
(rdf_type, parse_content_selector, parse_filter_selectors, lang;
cf. /root/reference/ferenda/documentrepository.py:205-295) plus which
structure recovery runs (SURVEY.md §2 P5-P7).
"""

from ferenda_spark import ns

REPOS = {
    "base": {
        "rdf_type": ns.FOAF_DOCUMENT,
        "classname": "ferenda.DocumentRepository",
        "content_selector": "body",
        "filter_selectors": ("script",),
        "structure": None,
        "lang": "en",
    },
    "w3c": {
        "rdf_type": ns.BIBO_STANDARD,
        "classname": "ferenda.sources.tech.W3Standards",
        "content_selector": "body",
        # w3c.py:30-31
        "filter_selectors": ("script", "div.toc", "div.head"),
        "structure": "w3c",
        "lang": "en",
    },
    "rfc": {
        "rdf_type": ns.BIBO_STANDARD,
        "classname": "ferenda.sources.tech.RFC",
        "content_selector": "body",
        "filter_selectors": ("script",),
        "structure": "rfc",
        "lang": "en",
    },
}

DEFAULT_REPO = REPOS["base"]
