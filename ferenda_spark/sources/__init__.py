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
        "citation_grammars": ("url",),
    },
    "w3c": {
        "rdf_type": ns.term("w3c", "Recommendation"),   # w3c.py:24
        # qualified_class_name() -> module path + class (w3c.py)
        "classname": "ferenda.sources.tech.w3c.W3Standards",
        "content_selector": "body",
        # w3c.py:30-31
        "filter_selectors": ("script", "div.toc", "div.head"),
        "structure": "w3c",
        "lang": "en",
        # the reference's W3Standards runs NO citation parser (its parse
        # flow never configures one) — validated by the distilled
        # goldens carrying no dcterms:references
        "citation_grammars": (),
        # parse_metadata_from_soup hardcodes the publisher (w3c.py:259)
        "publisher_uri": "http://localhost:8000/ext/w3c",
    },
    "rfc": {
        # default when no BCP/STD/FYI header key overrides (rfc.py:494-497)
        "rdf_type": ns.term("rfc", "RFC"),
        "classname": "ferenda.sources.tech.rfc.RFC",
        "content_selector": "body",
        "filter_selectors": ("script",),
        "structure": "rfc",
        "lang": "en",
        # the RFC repo's CitationParser has NO url grammar (rfc.py:429-451)
        "citation_grammars": ("rfc",),
    },
    "sfs": {
        # lagen.nu-style Swedish statute pages: the C6 lagrum grammar
        # runs as this repo's citation parser (operators/sfs.py)
        "rdf_type": ns.BIBO_STANDARD,
        "classname": "ferenda.sources.legal.se.SFS",
        "content_selector": "body",
        "filter_selectors": ("script",),
        "structure": None,
        "lang": "sv",
        "citation_grammars": ("sfs", "svlegal"),
    },
}

DEFAULT_REPO = REPOS["base"]
