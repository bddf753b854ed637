#!/usr/bin/env python3
"""Hostile-HTML fixture + golden for q_doc_html_hostile.

Generates a corpus that deliberately hits the scanner-only cases a
regex-pile HTML stripper tears on (quoted '>' inside attribute values,
unterminated quotes, unclosed comments/tags, script bodies containing
tag-like strings, numeric/named/malformed entities, astral-plane
references), plus the ordinary block/br/entity/whitespace cases.

The expected text is computed by an INDEPENDENT python implementation
of the documented html_to_text contract (single-pass state machine;
script/style/comment drop; block-close + <br> newlines; entity decode
after stripping; horizontal-run + blank-line collapse) — the same
fixture+golden recipe as tools/make_gdb_fixture.py: python accounting
on one side, the Scala engine on the other, parquet/CSV in between.

Writes:
  src/test/resources/html/hostile.parquet        (id BIGINT, html STRING)
  src/test/resources/golden/html_hostile_golden.parquet (id, txt)
"""
import os, re, sys
import pyarrow as pa
import pyarrow.parquet as pq

NAMED = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"',
    "apos": "'", "nbsp": " ", "copy": "©", "reg": "®",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "rsquo": "’", "lsquo": "‘",
    "rdquo": "”", "ldquo": "“",
}
BLOCK = {"p", "div", "li", "ul", "ol", "table", "tr",
         "h1", "h2", "h3", "h4", "h5", "h6",
         "section", "article", "blockquote", "pre"}


def extract(html: str) -> str:
    n = len(html)
    out = []
    i = 0
    skip_until = None
    while i < n:
        c = html[i]
        if skip_until is not None:
            if c == "<" and html[i:i + len(skip_until)].lower() == skip_until:
                j = i + len(skip_until)
                while j < n and html[j] != ">":
                    j += 1
                i = j + 1
                skip_until = None
            else:
                i += 1
        elif c == "<":
            if html[i:i + 4].lower() == "<!--":
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
            else:
                j = i + 1
                close = j < n and html[j] == "/"
                if close:
                    j += 1
                name_start = j
                while j < n and html[j].isalnum():
                    j += 1
                name = html[name_start:j].lower()
                q = None
                while j < n and (q is not None or html[j] != ">"):
                    ch = html[j]
                    if q is not None:
                        if ch == q:
                            q = None
                    elif ch in ('"', "'"):
                        q = ch
                    j += 1
                i = j + 1
                if not close and name == "script":
                    skip_until = "</script"
                elif not close and name == "style":
                    skip_until = "</style"
                elif name == "br" or (close and name in BLOCK):
                    out.append("\n")
        elif c == "&":
            semi = html.find(";", i + 1)
            decoded = None
            if semi >= 0 and semi - i <= 12:
                body = html[i + 1:semi]
                if body.startswith("#x") or body.startswith("#X"):
                    try:
                        decoded = chr(int(body[2:], 16))
                    except (ValueError, OverflowError):
                        decoded = None
                elif body.startswith("#"):
                    try:
                        decoded = chr(int(body[1:]))
                    except (ValueError, OverflowError):
                        decoded = None
                else:
                    decoded = NAMED.get(body)
            if decoded is not None:
                out.append(decoded)
                i = semi + 1
            else:
                out.append("&")
                i += 1
        else:
            out.append(c)
            i += 1
    s = "".join(out)
    s = re.sub(r"[ \t\x0b\f\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    # Java String.trim: strip every leading/trailing char <= U+0020
    b, e = 0, len(s)
    while b < e and ord(s[b]) <= 0x20:
        b += 1
    while e > b and ord(s[e - 1]) <= 0x20:
        e -= 1
    return s[b:e]


DOCS = [
    (1, "<p>Hello <b>world</b></p><p>Second paragraph</p>"),
    # '>' inside quoted attribute values — the regex-stripper killer
    (2, "<a href=\"x>y\" title='p>q'>link text</a> tail"),
    # script body containing a tag-like string split across literals
    (3, "<script type=\"a>b\">var a = 1 < 2 && \"</scr\" + \"ipt>\";"
        "</script>after script"),
    (4, "<style>p > a { color: red; } .x>li { margin: 0 }</style>styled text"),
    # unclosed comment swallows the rest
    (5, "before<!-- comment <p>never closed"),
    (6, "a<!-- short comment --><p>b</p>"),
    # unclosed tag at EOF
    (7, "text before <div class=\"x"),
    # unterminated quote: the tag consumes the rest of the document
    (8, "<a href=\"unterminated >still inside the attr</a> all gone"),
    # entity zoo: decode-after-strip, astral plane, malformed, overlong
    (9, "&lt;div&gt; &amp;amp; &#65;&#x42; &#x1F600; &bogus; "
        "&toolongname12; a&nbsp;&nbsp;b &#xZZ; &#-5; trailing &amp tail"),
    # br variants + blank-line collapse across empty blocks
    (10, "line1<br>line2<BR/>line3</p>next<p>x</p><p></p><p></p><p></p>trail"),
    # single-pass decode: &amp;lt; must stay the literal text "&lt;"
    (11, "&amp;lt; and &amp;#65; stay literal"),
    (12, "a \t b\r\n c<div> d</div>\n\n\n\n e"),
    # case-insensitive tag names, self-closing non-void block is no break
    (13, "<SCRIPT>sk</SCRIPT>ok<P>y</P><p/>nobreak here"),
    # nested blocks and lists
    (14, "<ul><li>one</li><li>two &ndash; dash</li></ul><h2>head</h2>body"),
    # tag-like text that is NOT a tag (digit start) and lone '<'
    (15, "2 < 3 and <5kg> x < y done"),
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fdir = os.path.join(root, "src/test/resources/html")
    gdir = os.path.join(root, "src/test/resources/golden")
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    ids = [i for i, _ in DOCS]
    htmls = [h for _, h in DOCS]
    txts = [extract(h) for h in htmls]
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "html": htmls}),
        os.path.join(fdir, "hostile.parquet"))
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "txt": txts}),
        os.path.join(gdir, "html_hostile_golden.parquet"))
    for i, t in zip(ids, txts):
        print(f"--- {i} ---\n{t}")


if __name__ == "__main__":
    main()
