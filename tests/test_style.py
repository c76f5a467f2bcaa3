"""Style gate (reference .gitlab-ci.yml style_check runs pycodestyle +
pylint; neither installs in this environment, so scripts/style_check.py
enforces the pycodestyle core rules with the stdlib and this test makes
`pytest` the single CI gate)."""
import subprocess
import sys
from pathlib import Path


def test_style_clean():
    root = Path(__file__).resolve().parent.parent
    res = subprocess.run(
        [sys.executable, str(root / 'scripts' / 'style_check.py')],
        capture_output=True, text=True)
    assert res.returncode == 0, \
        f'style violations:\n{res.stdout}\n{res.stderr}'
