"""Generate notebook-format examples from the runnable .py demos.

The reference ships its library-API recipes as Jupyter notebooks
(/root/reference/examples/*.ipynb, doc/index.rst:40-57); this repo
keeps the executable .py scripts as the regression vehicles and
derives .ipynb mirrors so notebook users get the same workflows:

    python examples/make_notebooks.py     # writes examples/notebooks/

Each demo becomes a notebook with the docstring as a markdown cell
and the code split into cells at blank-line-separated top-level
blocks (comment-led blocks start a new cell).
"""

import ast
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
DEMOS = ["donors_demo.py", "clones_demo.py", "bulk_demo.py",
         "large_pool_demo.py", "donor_match_demo.py"]


def split_cells(body):
    """Split demo code into notebook cells: a new cell starts at each
    comment line that follows a blank line (section headers)."""
    cells, cur = [], []
    prev_blank = True
    for line in body.splitlines():
        if line.startswith("#") and prev_blank and cur:
            cells.append("\n".join(cur).strip("\n"))
            cur = []
        cur.append(line)
        prev_blank = line.strip() == ""
    if cur:
        cells.append("\n".join(cur).strip("\n"))
    return [c for c in cells if c.strip()]


def convert(path, out_dir):
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""
    # drop the module docstring from the code body
    body = src
    if doc:
        first = tree.body[0]
        lines = src.splitlines(keepends=True)
        body = "".join(lines[first.end_lineno:])

    nb = nbf.v4.new_notebook()
    title = os.path.basename(path).replace("_", " ").replace(".py", "")
    nb.cells = [nbf.v4.new_markdown_cell("# %s\n\n%s" % (title, doc))]
    nb.cells += [nbf.v4.new_code_cell(c) for c in split_cells(body)]
    out = os.path.join(out_dir,
                       os.path.basename(path).replace(".py", ".ipynb"))
    with open(out, "w") as f:
        nbf.write(nb, f)
    return out


def main():
    out_dir = os.path.join(HERE, "notebooks")
    os.makedirs(out_dir, exist_ok=True)
    for demo in DEMOS:
        p = os.path.join(HERE, demo)
        if os.path.exists(p):
            print("wrote", convert(p, out_dir))


if __name__ == "__main__":
    main()
