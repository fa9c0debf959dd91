"""Well-known RDF namespaces, mirroring the reference's prefix table
(/root/reference/ferenda/util.py:74-89) plus the RFC vocabulary used by
its RFC source (/root/reference/ferenda/sources/tech/rfc.py:96-99).
"""

NS = {
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsi": "http://www.w3.org/2001/XMLSchema-instance",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "prov": "http://www.w3.org/ns/prov#",
    "bibo": "http://purl.org/ontology/bibo/",
    "schema": "http://schema.org/",
    "olo": "http://purl.org/ontology/olo/core#",
    # the RFC/W3C vocabs the reference mints ad hoc (rfc.py:96-99,
    # w3c.py:24,39-40)
    "rfc": "http://example.org/ontology/rfc/",
    "w3c": "http://example.org/ontology/w3c/",
}


def term(prefix: str, local: str) -> str:
    """Full URI for prefix:local, e.g. term('dcterms','title')."""
    return NS[prefix] + local


RDF_TYPE = term("rdf", "type")
DCT_TITLE = term("dcterms", "title")
DCT_IDENTIFIER = term("dcterms", "identifier")
DCT_ISSUED = term("dcterms", "issued")
DCT_PUBLISHER = term("dcterms", "publisher")
DCT_CREATOR = term("dcterms", "creator")
DCT_SUBJECT = term("dcterms", "subject")
DCT_REFERENCES = term("dcterms", "references")
DCT_ISPARTOF = term("dcterms", "isPartOf")
DCT_RIGHTSHOLDER = term("dcterms", "rightsHolder")
DCT_ISSN = term("dcterms", "issn")
PROV_WASGENERATEDBY = term("prov", "wasGeneratedBy")
BIBO_DOCUMENTPART = term("bibo", "DocumentPart")
BIBO_CHAPTER = term("bibo", "chapter")
BIBO_STANDARD = term("bibo", "Standard")
FOAF_DOCUMENT = term("foaf", "Document")
FOAF_NAME = term("foaf", "name")
BIBO_IDENTIFIER = term("bibo", "identifier")
RFC_UPDATES = term("rfc", "updates")
RFC_OBSOLETES = term("rfc", "obsoletes")
RFC_BCPNUMBER = term("rfc", "bcpnumber")
RFC_STDNUMBER = term("rfc", "stdnumber")
RFC_FYINUMBER = term("rfc", "fyinumber")
BIBO_SHORTTITLE = term("bibo", "shortTitle")
XSD_DATE = term("xsd", "date")
XSD_GYEARMONTH = term("xsd", "gYearMonth")
