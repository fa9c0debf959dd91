"""Unit tests for the pure-Python parse/extract kernel — reference
semantics (file:line cites in ferenda_spark/htmlparse.py)."""

from ferenda_spark import htmlparse as hp


def test_normalize_space():
    # util.py:279-290 doctest
    assert hp.normalize_space(" This is  a long \n string\n") == "This is a long string"
    assert hp.normalize_space("a\xa0b") == "a b"


def test_parse_and_clean_drops_script_style_comments():
    tree = hp.parse_html(
        "<html><body><p>keep</p><script>drop()</script>"
        "<style>p{}</style><!-- gone --><font>x</font>"
        "<blink>unknown-tag</blink></body></html>"
    )
    cleaned = hp.clean_tree(tree)
    assert hp.as_plaintext(cleaned) == "keep"


def test_clean_keeps_whitelisted_attrs_only():
    tree = hp.parse_html('<div class="c" id="i" style="x" onclick="y" href="h">t</div>')
    cleaned = hp.clean_tree(tree)
    div = hp.find_first(cleaned, "div")
    assert div.attrs == {"class": "c", "id": "i", "href": "h"}


def test_as_plaintext_join_rule():
    # elements.py:233-245: filter empty children, single space between rest
    tree = hp.parse_html("<div><p>a  b</p><p>  </p><p>c</p>see <a>x</a>.</div>")
    cleaned = hp.clean_tree(tree)
    assert hp.as_plaintext(cleaned) == "a b c see x ."


def test_extract_plaintext_trailspace_quirk():
    # documentrepository.py:2078: ("a" "b",...) == ("ab",...) so <a>,<b>
    # get trailing space, <i>/<span> do not
    t1 = hp.find_first(hp.clean_tree(hp.parse_html("<p>x<a>link</a>y</p>")), "p")
    assert hp.extract_plaintext(t1) == "xlink y "
    t2 = hp.find_first(hp.clean_tree(hp.parse_html("<p>x<span>s</span>y</p>")), "p")
    assert hp.extract_plaintext(t2) == "xsy "


def test_charset_sniff_and_replace():
    data = '<html><head><meta charset="iso-8859-1"></head><body>r\xe9</body></html>'.encode("iso-8859-1")
    assert hp.sniff_charset(data) == "iso-8859-1"
    assert "ré" in hp.decode_html(data)
    # invalid utf-8 byte under default utf-8 -> U+FFFD, never an exception
    assert "�" in hp.decode_html(b"<p>bad \xff byte</p>")


def test_content_select_and_filters():
    tree = hp.parse_html(
        '<html><body><div class="toc">skip</div><div class="x"><p>hit</p></div>'
        "<script>s</script></body></html>"
    )
    body = hp.content_select(tree, "body", ("script", "div.toc"))
    assert hp.as_plaintext(hp.clean_tree(body)) == "hit"
    assert hp.content_select(tree, "article") is None


def test_doc_lang_fallback_chain():
    assert hp.doc_lang(hp.parse_html('<html lang="sv"></html>'), "en") == "sv"
    assert hp.doc_lang(hp.parse_html('<html xml:lang="de" lang="sv"></html>'), "en") == "de"
    assert hp.doc_lang(hp.parse_html("<html></html>"), "en") == "en"


def test_head_meta_property_pairs():
    tree = hp.parse_html(
        '<html><head><meta property="dcterms:issued" content="2014-01-01">'
        '<meta name="k" content="v"><meta charset="utf-8"></head></html>'
    )
    assert hp.head_meta(tree) == {"dcterms:issued": "2014-01-01", "k": "v"}
