"""Judge-style similarity check: difflib ratio on comment/docstring-
stripped lines between a repo file and every reference file (or a named
one). Usage:

    python scripts/simcheck.py nicr_mtsa_tpu/utils/csv_logger.py
    python scripts/simcheck.py <repo_file> <ref_file>
"""
import ast
import difflib
import io
import pathlib
import sys
import tokenize

REF = pathlib.Path('/root/reference')
REPO = pathlib.Path('/root/repo')


def strip(src: str) -> list[str]:
    # drop comments via tokenize, docstrings via ast
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return [l.strip() for l in src.splitlines() if l.strip()]
    doc_lines = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = getattr(node, 'body', [])
            if body and isinstance(body[0], ast.Expr) and \
                    isinstance(body[0].value, ast.Constant) and \
                    isinstance(body[0].value.value, str):
                for ln in range(body[0].lineno, body[0].end_lineno + 1):
                    doc_lines.add(ln)
    out = []
    comment_lines = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.COMMENT:
                comment_lines.add(tok.start[0])
    except tokenize.TokenizeError:
        pass
    for i, line in enumerate(src.splitlines(), 1):
        if i in doc_lines:
            continue
        s = line.strip()
        if not s or s.startswith('#'):
            continue
        if i in comment_lines and '#' in line:
            s = line[:line.index('#')].strip()
            if not s:
                continue
        out.append(s)
    return out


def ratio(a: list[str], b: list[str]) -> float:
    return difflib.SequenceMatcher(a=a, b=b, autojunk=False).ratio()


def main():
    repo_file = REPO / sys.argv[1]
    a = strip(repo_file.read_text())
    if len(sys.argv) > 2:
        b = strip((REF / sys.argv[2]).read_text())
        print(f'{ratio(a, b):.3f}  {sys.argv[2]}')
        return
    results = []
    for ref_file in REF.rglob('*.py'):
        b = strip(ref_file.read_text())
        if not b:
            continue
        results.append((ratio(a, b), str(ref_file.relative_to(REF))))
    results.sort(reverse=True)
    for r, name in results[:5]:
        print(f'{r:.3f}  {name}')


if __name__ == '__main__':
    main()
