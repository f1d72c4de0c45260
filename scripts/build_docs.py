"""Static docs site builder (the reference ships a jupyter-book site,
/root/reference/.github/workflows/jupyter-book.yml; this is the
zero-extra-dependency equivalent using the stdlib-adjacent ``markdown``
package already in the environment).

Renders the documentation set to docs/_site/*.html with a shared nav:

    python scripts/build_docs.py        # writes docs/_site/

Pages: README, docs/*.md, BENCHMARKS, PARITY, BASELINE, SURVEY.
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES = [
    ("index", "README.md", "Overview"),
    ("configurations", "docs/configurations.md", "Configuration reference"),
    ("migration", "docs/MIGRATION.md", "Migrating from FuxiCTR"),
    ("serving", "docs/SERVING.md", "Serving guide"),
    ("benchmarks", "BENCHMARKS.md", "Performance notes"),
    ("parity", "PARITY.md", "Reference parity map"),
]

TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — fuxictr_tpu</title>
<style>
 body {{ font: 16px/1.6 system-ui, sans-serif; margin: 0; color: #1a1a1a; }}
 nav {{ background: #14213d; padding: .6rem 1.2rem; }}
 nav a {{ color: #e5e5e5; margin-right: 1.1rem; text-decoration: none;
          font-size: .95rem; }}
 nav a.current {{ color: #fca311; font-weight: 600; }}
 main {{ max-width: 54rem; margin: 0 auto; padding: 1.5rem; }}
 pre {{ background: #f4f4f4; padding: .8rem; overflow-x: auto;
        border-radius: 6px; font-size: .85rem; }}
 code {{ background: #f4f4f4; padding: .08rem .25rem; border-radius: 3px;
         font-size: .9em; }}
 pre code {{ padding: 0; background: none; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
 h1, h2 {{ border-bottom: 1px solid #eee; padding-bottom: .2rem; }}
</style></head><body>
<nav>{nav}</nav>
<main>{body}</main>
</body></html>
"""


def build(out_dir=None):
    import markdown

    out_dir = out_dir or os.path.join(ROOT, "docs", "_site")
    os.makedirs(out_dir, exist_ok=True)
    nav_items = [(slug, title) for slug, path, title in PAGES
                 if os.path.exists(os.path.join(ROOT, path))]
    written = []
    for slug, path, title in PAGES:
        src = os.path.join(ROOT, path)
        if not os.path.exists(src):
            continue
        with open(src) as fd:
            text = fd.read()
        # rewrite in-repo .md links to the rendered pages
        for s2, p2, _ in PAGES:
            base = os.path.basename(p2)
            text = re.sub(rf"\(((?:\./|docs/)?{re.escape(base)})\)",
                          f"({s2}.html)", text)
        body = markdown.markdown(
            text, extensions=["tables", "fenced_code", "toc"])
        nav = "".join(
            f'<a href="{s}.html"'
            + (' class="current"' if s == slug else "") + f">{t}</a>"
            for s, t in nav_items)
        out = os.path.join(out_dir, f"{slug}.html")
        with open(out, "w") as fd:
            fd.write(TEMPLATE.format(title=title, nav=nav, body=body))
        written.append(out)
    print(f"built {len(written)} pages -> {out_dir}")
    return written


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
