from my_ocr_ray.functions.html import extract_main_html, html_blocks

DOC = """
<html><head><title>t</title><style>body{}</style></head>
<body>
<nav><a href="/">home</a> <a href="/x">about</a></nav>
<div class="menu"><a href="1">one</a> <a href="2">two</a> <a href="3">three</a></div>
<article>
<p>This is the real main content of the page with a good amount of
informative text that should clearly dominate the density scoring.</p>
<p>A second substantive paragraph continues the article body with more
meaningful prose for the extractor to keep.</p>
</article>
<footer><a href="/tos">terms</a> <a href="/priv">privacy</a></footer>
</body></html>
"""


def test_blocks_parsed_and_scored():
    blocks = html_blocks(DOC)
    assert blocks, "no blocks"
    assert all("score" in b and "link_density" in b for b in blocks)


def test_main_content_extracted_boilerplate_dropped():
    main = extract_main_html(DOC)
    assert "real main content" in main
    assert "second substantive paragraph" in main
    # nav/footer stripped entirely (SKIP_TAGS), link-dense menu dropped by density
    assert "home" not in main and "privacy" not in main
    assert "one" not in main


def test_empty_html():
    assert extract_main_html("") == ""
    assert extract_main_html("<div></div>") == ""


def test_wrap_html_doc_roundtrip():
    from my_ocr_ray.synth import wrap_html_doc

    cases = [
        (0, "plain words here"),
        (7, "  leading   and   trailing  spaces  "),
        (42, "special <chars> & \"entities\" 'quoted'"),
        ("doc-00000013", "synthetic corpus id form"),
        (5, ""),
        (6, "   "),
    ]
    for doc_id, text in cases:
        page = wrap_html_doc(doc_id, text)
        expect = " ".join(text.split())
        assert extract_main_html(page) == expect, (doc_id, text)


def test_wrap_html_doc_block_counts():
    from my_ocr_ray.synth import wrap_html_doc

    # content + link-farm when text nonempty; link-farm only when empty
    assert len(html_blocks(wrap_html_doc(3, "body text"))) == 2
    assert len(html_blocks(wrap_html_doc(3, ""))) == 1
    # link-farm div has link_density exactly 1.0 -> dropped by density
    farm = [b for b in html_blocks(wrap_html_doc(3, "x")) if b["link_density"] == 1.0]
    assert len(farm) == 1 and farm[0]["score"] == 0.0
