"""HTML -> Markdown renderer: per-element rules, escaping, fixture
layout round-trips, and renderer/python-expected parity."""

import hashlib

import pandas as pd

from paddleocr_spark.operators import markdown as md


def test_headings_paragraphs_and_inline():
    html = (
        "<body><h2>Title &amp; more</h2>"
        "<p>Plain <strong>bold</strong> and <em>it</em> with "
        '<a href="/x">link</a> and <code>a_b*c</code>.</p></body>'
    )
    out, n = md.render_markdown(html)
    assert n == 2
    assert out == (
        "## Title & more\n\n"
        "Plain **bold** and *it* with [link](/x) and `a_b*c`."
    )


def test_escaping_in_text_nodes():
    out, _ = md.render_markdown("<p>keep *a* _b_ [c] #d `e` \\f</p>")
    assert out == "keep \\*a\\* \\_b\\_ \\[c\\] \\#d \\`e\\` \\\\f"


def test_lists_quote_rule_and_fence():
    html = (
        "<ul><li>one</li><li>two</li></ul>"
        "<ol><li>a</li><li>b</li><li>c</li></ol>"
        "<blockquote>wise words</blockquote>"
        '<pre><code class="language-sql">SELECT 1;</code></pre>'
        "<pre><code>no lang</code></pre>"
        "<hr>"
    )
    out, n = md.render_markdown(html)
    blocks = out.split("\n\n")
    assert n == 6
    assert blocks[0] == "- one\n- two"
    assert blocks[1] == "1. a\n2. b\n3. c"
    assert blocks[2] == "> wise words"
    assert blocks[3] == "```sql\nSELECT 1;\n```"
    assert blocks[4] == "```\nno lang\n```"
    assert blocks[5] == "---"


def test_table_pipe_rows():
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr>"
        "<tr><td>b</td><td>2</td></tr></table>"
    )
    out, n = md.render_markdown(html)
    assert n == 1
    assert out == "| k | v |\n| --- | --- |\n| a | 1 |\n| b | 2 |"


def test_img_and_br_inline():
    out, _ = md.render_markdown(
        '<p>see <img src="/i.png" alt="pic"> here<br>next line</p>'
    )
    assert out == "see ![pic](/i.png) here\nnext line"


def _expected_fixture_md(text: str, seed: int) -> tuple[str, int]:
    sid = str(seed % 1000)
    blocks = [f"# Doc {sid} guide"]
    blocks.append(
        f"Lead for doc {sid} with **bold term**, *em text*, an inline "
        f"`cfg_{sid}`, [ref link](/ref/{sid}) and raw \\*stars\\* "
        "plus \\_under\\_."
    )
    if seed % 3 == 0:
        blocks.append(f"- alpha {sid}\n- beta item")
    elif seed % 3 == 1:
        blocks.append(f"1. first step\n2. step {sid}")
        blocks.append(f"> quoted note {sid}")
    else:
        blocks.append(
            f"| key | val |\n| --- | --- |\n| size | {sid} |"
        )
    blocks.append(f"```python\nx = {sid} & 7\n```")
    blocks.append(text.strip())
    blocks.append("---")
    return "\n\n".join(blocks), len(blocks)


def test_fixture_layouts_match_closed_form():
    """Every %3 layout renders to the oracle's closed-form markdown."""
    for seed in (0, 1, 2, 999, 1000, 1001):
        text = f"soup words tail {seed} "
        want, want_n = _expected_fixture_md(text, seed)
        got, got_n = md.render_markdown(md.markdown_page(text, seed))
        assert (got, got_n) == (want, want_n), f"seed {seed}"


def test_html_markdown_spark_matches_expected(spark, tmp_path):
    rows = [(i, f"plain soup d{i}") for i in range(9)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["markdown_md5"])
        for r in md.html_markdown(spark, str(tmp_path)).collect()
    }
    for i in range(9):
        want, want_n = _expected_fixture_md(f"plain soup d{i}", i)
        assert got[i] == (
            want_n,
            hashlib.md5(want.encode()).hexdigest(),
        ), f"doc {i}"
