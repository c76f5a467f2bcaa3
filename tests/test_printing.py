"""Colored console helpers (utils/_printing.py).

Reference analogue: utils/_printing.py (cprint/cprint_section/
cprint_step used by model init logging).
"""
import io

from nicr_mtsa_tpu.utils import cprint, cprint_section, cprint_step


class _TTYBuffer(io.StringIO):
    def isatty(self):
        return True


def test_cprint_plain_stream_has_no_escapes():
    buf = io.StringIO()
    cprint('hello', 42, color='red', attrs=('bold',), file=buf)
    assert buf.getvalue() == 'hello 42\n'


def test_cprint_tty_stream_styles(monkeypatch):
    monkeypatch.delenv('NO_COLOR', raising=False)
    buf = _TTYBuffer()
    cprint('hot', color='red', file=buf)
    out = buf.getvalue()
    assert out.startswith('\033[31m') and out.endswith('\033[0m\n')
    assert 'hot' in out


def test_cprint_respects_no_color(monkeypatch):
    monkeypatch.setenv('NO_COLOR', '1')
    buf = _TTYBuffer()
    cprint('quiet', color='red', file=buf)
    assert buf.getvalue() == 'quiet\n'


def test_cprint_section_frames_message():
    buf = io.StringIO()
    cprint_section('header', file=buf)
    lines = buf.getvalue().splitlines()
    assert lines == ['-' * 40, 'header', '-' * 40]


def test_cprint_step_is_plain_when_piped():
    buf = io.StringIO()
    cprint_step('step 1')  # default stream: must not raise
    cprint_step('step 2', file=buf)
    assert buf.getvalue() == 'step 2\n'
