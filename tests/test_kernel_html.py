"""Layer-1 kernel tests: HTML extraction against hand-computed goldens
(these catch kernel bugs; the e2e tests catch pipeline corruption)."""

from table_ocr_spark.kernel.html_extract import extract_html


def cells_tuples(r):
    return [(c.table_id, c.row, c.col, c.rowspan, c.colspan, c.text) for c in r.cells]


class TestBoilerplate:
    def test_nav_header_footer_aside_dropped(self):
        html = (
            "<body><nav><a href='/'>x</a></nav><header>site header text here</header>"
            "<article><p>keep me please</p></article>"
            "<aside>sidebar words</aside><footer>foot</footer></body>"
        )
        assert extract_html(html).text == "keep me please"

    def test_linky_div_dropped_texty_div_kept(self):
        html = (
            "<body><div><a href='/a'>one</a> <a href='/b'>two</a> "
            "<a href='/c'>three links dominate this</a></div>"
            "<div>this plain paragraph easily exceeds the forty character "
            "minimum threshold</div></body>"
        )
        assert (
            extract_html(html).text
            == "this plain paragraph easily exceeds the forty character minimum threshold"
        )

    def test_short_non_article_block_dropped(self):
        assert extract_html("<body><div>short</div></body>").text == ""

    def test_article_keeps_short_blocks(self):
        assert extract_html("<body><article><p>short</p></article></body>").text == "short"

    def test_script_style_ignored(self):
        html = (
            "<body><script>var x = 'not text';</script><style>p{}</style>"
            "<article><p>real</p></article></body>"
        )
        assert extract_html(html).text == "real"


class TestEncoding:
    def test_entities_and_nbsp(self):
        html = "<article><p>A &amp; B&nbsp;&lt;C&gt;</p></article>"
        assert extract_html(html).text == "A & B <C>"

    def test_bytes_input_utf8(self):
        html = "<article><p>Größe 天地 مرحبا</p></article>".encode("utf-8")
        assert extract_html(html).text == "Größe 天地 مرحبا"

    def test_mixed_newlines_collapse(self):
        html = b"<article><p>a\r\nb\rc\nd</p></article>"
        assert extract_html(html).text == "a b c d"

    def test_blocks_joined_with_newline(self):
        html = "<article><p>one</p><p>two</p></article>"
        assert extract_html(html).text == "one\ntwo"


class TestTables:
    def test_plain_grid(self):
        html = "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
        r = extract_html(html)
        assert r.n_tables == 1
        assert cells_tuples(r) == [
            (0, 0, 0, 1, 1, "a"), (0, 0, 1, 1, 1, "b"),
            (0, 1, 0, 1, 1, "1"), (0, 1, 1, 1, 1, "2"),
        ]

    def test_rowspan_colspan_occupancy(self):
        html = (
            "<table><tr><td rowspan='2'>A</td><td>B</td><td>C</td></tr>"
            "<tr><td colspan='2'>D</td></tr></table>"
        )
        r = extract_html(html)
        assert cells_tuples(r) == [
            (0, 0, 0, 2, 1, "A"), (0, 0, 1, 1, 1, "B"), (0, 0, 2, 1, 1, "C"),
            (0, 1, 1, 1, 2, "D"),
        ]

    def test_ditto_resolution(self):
        html = (
            "<table><tr><td>x</td><td>München</td></tr>"
            '<tr><td>y</td><td>"</td></tr>'
            '<tr><td>z</td><td>"</td></tr></table>'
        )
        r = extract_html(html)
        col1 = [c.text for c in r.cells if c.col == 1]
        assert col1 == ["München", "München", "München"]

    def test_sliver_table_skipped(self):
        html = "<table><tr><td>a</td></tr><tr><td>b</td></tr></table>"
        r = extract_html(html)
        assert r.n_tables == 0 and r.cells == []

    def test_single_row_table_skipped(self):
        html = "<table><tr><td>a</td><td>b</td></tr></table>"
        assert extract_html(html).n_tables == 0

    def test_nested_table_text_flows_to_host_cell(self):
        html = (
            "<table><tr><td>out1</td><td><table><tr><td>in</td></tr></table></td></tr>"
            "<tr><td>out2</td><td>out3</td></tr></table>"
        )
        r = extract_html(html)
        assert r.n_tables == 1
        host = [c for c in r.cells if c.row == 0 and c.col == 1][0]
        assert host.text == "in"

    def test_table_text_not_in_extracted_text(self):
        html = (
            "<article><p>prose</p></article>"
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
        )
        r = extract_html(html)
        assert r.text == "prose"
        assert len(r.cells) == 4

    def test_empty_cells_kept(self):
        html = "<table><tr><td>a</td><td></td></tr><tr><td></td><td>d</td></tr></table>"
        r = extract_html(html)
        texts = {(c.row, c.col): c.text for c in r.cells}
        assert texts[(0, 1)] == "" and texts[(1, 0)] == ""

    def test_multiple_tables_numbered_in_order(self):
        html = (
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
            "<table><tr><td>1</td></tr></table>"  # sliver — skipped
            "<table><tr><td>e</td><td>f</td></tr><tr><td>g</td><td>h</td></tr></table>"
        )
        r = extract_html(html)
        assert r.n_tables == 2
        assert {c.table_id for c in r.cells} == {0, 1}


class TestRobustness:
    def test_unclosed_tags(self):
        html = "<body><article><p>one<p>two</article>"
        assert extract_html(html).text == "one\ntwo"

    def test_empty_document(self):
        r = extract_html(b"")
        assert r.text == "" and r.cells == [] and r.n_tables == 0

    def test_invalid_utf8_replaced(self):
        r = extract_html(b"<article><p>ok \xff\xfe</p></article>")
        assert "ok" in r.text

    def test_determinism(self):
        html = "<article><p>stable output</p></article>".encode()
        assert extract_html(html).text == extract_html(html).text

    def test_pathological_quote_attrs_linear_time(self):
        # ADVICE (round 1): the old attrs pattern backtracked
        # exponentially on an unterminated tag with repeated quotes
        # (16 pairs = 0.7 s, 20 pairs > 10 s). Crawl HTML is untrusted
        # and frequently truncated mid-tag; one page must never hang an
        # executor core. 40 pairs must now parse in well under a second.
        import time

        html = '<a href=' + '"x"y' * 40  # unterminated tag, 40 quote pairs
        t0 = time.perf_counter()
        extract_html(html)
        assert time.perf_counter() - t0 < 0.5

        # same shape embedded in a real doc: content still extracted
        doc = (
            "<article><p>before the bad tag, long enough to keep</p></article>"
            + html
        )
        r = extract_html(doc)
        assert "before the bad tag" in r.text

    def test_truncated_mid_tag_no_blowup(self):
        import time

        for bad in (
            "<div class=" + "'a'b" * 30,          # unbalanced single quotes
            "</div   " + "x" * 5000,              # end tag, '>' never comes
            "<div " + " " * 5000 + "q='",         # whitespace run then open quote
        ):
            t0 = time.perf_counter()
            extract_html("<article><p>kept text long enough to pass</p></article>" + bad)
            assert time.perf_counter() - t0 < 0.5

    def test_mixed_case_span_attrs(self):
        # ADVICE (round 1): rowSPan=3 silently became span 1 because the
        # substring gate was case-sensitive while the regex was not
        html = (
            "<table><tr><td rowSPan=2>a</td><td>b</td></tr>"
            "<tr><td>c</td></tr></table>"
        )
        r = extract_html(html)
        spans = {(c.row, c.col): (c.rowspan, c.colspan) for c in r.cells}
        assert spans[(0, 0)] == (2, 1)
        # cell 'c' is pushed to col 1 by the rowspan occupancy
        assert (1, 1) in spans

    def test_truncated_tail_dropped_not_leaked(self):
        # pinned eof-in-tag semantics: fragment dropped, never text
        base = "<article><p>kept body text of this page</p></article>"
        for tail in ("<a", "<a href=", "<a href='x", "<td", "</div",
                     "<!--unterminated comment", "<table><tr><td"):
            r = extract_html(base + tail)
            assert r.text == "kept body text of this page", tail
            assert "<" not in r.text and "href" not in r.text, tail

        # a trailing truncated <td> must not mint a phantom cell
        doc = (
            "<table><tr><td>a</td><td>b</td></tr>"
            "<tr><td>c</td><td>d</td></tr></table><table><tr><td"
        )
        r = extract_html(doc)
        assert len(r.cells) == 4 and r.n_tables == 1

    def test_unterminated_quote_recovers_at_gt(self):
        # quote never closes but a '>' exists: tag kept, value truncated
        r = extract_html('<article><p>before</p></article><p a="x>after words</p>')
        assert "after words" in r.text or r.text == "before"
        # deterministic either way:
        assert extract_html('<p a="x>y</p>').text == extract_html('<p a="x>y</p>').text

    def test_adversarial_span_table_bounded(self):
        # occupancy footprint budget: 200 cells x rowspan/colspan 1000
        # declared over 200 rows must finish fast (untrusted HTML must
        # never hang an executor core on the grid build)
        import time

        rows = "".join(
            "<tr><td rowspan=1000 colspan=1000>x</td></tr>" for _ in range(200)
        )
        # Thread CPU time, not wall time and not process CPU time:
        # the budget guards algorithmic work (an unbounded occupancy
        # grid would cost minutes, not seconds). Wall time flakes when
        # co-tenant load deschedules the process mid-parse, and
        # process_time() flakes too in a full-suite run — the live
        # Spark py4j client threads in this process accrue CPU while
        # the parse is descheduled (observed: >10 s process_time for a
        # 2.3 s parse). thread_time() charges only the parsing thread.
        # The honest cost is ~2 s; 10 s leaves margin without letting
        # the quadratic pathology back in.
        t0 = time.thread_time()
        r = extract_html("<table>" + rows + "</table>")
        assert time.thread_time() - t0 < 10.0
        assert len(r.cells) == 200

    def test_aria_and_data_span_attrs_ignored(self):
        html = (
            '<table><tr><td aria-colspan="3" data-rowspan="5">a</td>'
            "<td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
        )
        r = extract_html(html)
        grid = {(c.row, c.col): (c.text, c.rowspan, c.colspan) for c in r.cells}
        assert grid[(0, 0)] == ("a", 1, 1)  # aria-/data- are NOT spans
        assert grid[(0, 1)][0] == "b" and grid[(1, 1)][0] == "d"

def test_self_closing_container_tags_do_not_swallow_page():
    """Round-5 regression (confirmed by execution pre-fix): a
    self-closing script/header/a tag leaked skip/boiler/link depth and
    silently emptied every later block. Start+end delivery (stdlib
    handle_startendtag semantics) balances the depth counters."""
    body = b"<p>this paragraph carries more than enough characters to pass the minimum block length filter</p>"
    for prefix in (
        b'<script src="a.js"/>',
        b"<header/>",
        b"<a/>",
        b"<nav/>",
        b"<iframe/>",
    ):
        r = extract_html(b"<html><body>" + prefix + body + b"</body></html>")
        assert "minimum block length" in r.text, prefix
    # unquoted trailing slash is a VALUE character, not self-closing:
    # the anchor stays open and its text still counts as link text
    r = extract_html(
        b'<a href=http://x.test/>all of this text is one giant link so link density drops the block</a>'
    )
    assert r.text == ""

def test_block_boundaries_inside_cells_separate_words():
    """Round-5 regression: '<td><p>alpha</p><p>beta</p></td>' read
    'alphabeta' -- block-tag boundaries inside a cell now emit a
    separator, collapsed exactly by the cell's normalize pass."""
    r = extract_html(
        b"<table><tr><th>h1</th><th>h2</th></tr>"
        b"<tr><td><p>alpha</p><div>beta</div><li>gamma</li></td>"
        b"<td>x</td></tr></table>"
    )
    cells = {(c.row, c.col): c.text for c in r.cells}
    assert cells[(1, 0)] == "alpha beta gamma"
    assert cells[(1, 1)] == "x"

