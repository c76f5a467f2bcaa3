#!/usr/bin/env python
"""Dependency-free style gate (reference .gitlab-ci.yml style_check).

The reference CI runs pycodestyle + pylint; neither is installable in
this environment, so this implements the pycodestyle core rules that
the reference's config enforces, using only the stdlib:

- E501 line longer than 79 characters (URLs / noqa-tagged lines exempt)
- W291/W293 trailing whitespace
- W191 tabs in indentation
- W292 no newline at end of file
- W391 blank line at end of file
- CRLF line endings / UTF-8 BOM

Exit code 0 iff clean. Run: python scripts/style_check.py [paths...]
Also enforced by tests/test_style.py so `pytest` is the single gate.
"""
import sys
from pathlib import Path

MAX_LINE = 79
DEFAULT_TARGETS = ('nicr_mtsa_tpu', 'tests', 'scripts', 'examples',
                   'bench.py', '__graft_entry__.py')


def check_file(path: Path):
    problems = []
    raw = path.read_bytes()
    if raw.startswith(b'\xef\xbb\xbf'):
        problems.append((1, 'BOM', 'UTF-8 BOM'))
    if b'\r' in raw:
        problems.append((1, 'CRLF', 'carriage returns present'))
    text = raw.decode('utf-8')
    if text and not text.endswith('\n'):
        problems.append((text.count('\n') + 1, 'W292',
                         'no newline at end of file'))
    lines = text.split('\n')
    if len(lines) > 1 and lines[-1] == '' and lines[-2].strip() == '':
        problems.append((len(lines) - 1, 'W391',
                         'blank line at end of file'))
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LINE and 'noqa' not in line \
                and 'http://' not in line and 'https://' not in line:
            problems.append((i, 'E501',
                             f'line too long ({len(line)} > {MAX_LINE})'))
        if line != line.rstrip():
            problems.append((i, 'W291', 'trailing whitespace'))
        stripped = line.lstrip(' ')
        if stripped.startswith('\t'):
            problems.append((i, 'W191', 'tab in indentation'))
    return problems


def main(argv):
    targets = argv[1:] or DEFAULT_TARGETS
    root = Path(__file__).resolve().parent.parent
    files = []
    for t in targets:
        p = (root / t) if not Path(t).is_absolute() else Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob('*.py')))
        elif p.suffix == '.py':
            files.append(p)
    n = 0
    for f in files:
        for lineno, code, msg in check_file(f):
            print(f'{f.relative_to(root)}:{lineno}: {code} {msg}')
            n += 1
    print(f'style_check: {n} problem(s) in {len(files)} files')
    return 1 if n else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
