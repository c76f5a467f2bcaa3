"""Colored console output for run scripts and verbose model bring-up.

TPU-native counterpart of the reference's console helpers
(reference utils/_printing.py, consumed by model/initialization.py:45-79
for init progress messages). Implemented directly over ANSI SGR codes —
no optional termcolor dependency — and silent about styling when the
stream is not a terminal or ``NO_COLOR`` is set, so piped logs stay
clean.
"""
import os
import sys

_SGR = {
    'grey': 90, 'red': 31, 'green': 32, 'yellow': 33,
    'blue': 34, 'magenta': 35, 'cyan': 36, 'white': 37,
}
_ATTR = {'bold': 1, 'dark': 2, 'underline': 4, 'reverse': 7}


def _style_codes(color, attrs):
    codes = [_ATTR[a] for a in (attrs or ()) if a in _ATTR]
    if color in _SGR:
        codes.append(_SGR[color])
    return codes


def _styling_active(stream) -> bool:
    if 'NO_COLOR' in os.environ:
        return False
    isatty = getattr(stream, 'isatty', None)
    return bool(isatty and isatty())


def cprint(*values, color=None, attrs=None, **print_kwargs):
    """``print`` with optional ANSI color/attributes.

    Styling applies only when the target stream is a terminal; the
    ``color``/``attrs`` keywords are accepted (and ignored) otherwise,
    so callers never need to branch on the output destination.
    """
    print_kwargs.pop('on_color', None)   # background colors: not used
    stream = print_kwargs.get('file') or sys.stdout
    codes = _style_codes(color, attrs)
    if codes and _styling_active(stream):
        text = print_kwargs.pop('sep', ' ').join(str(v) for v in values)
        prefix = ''.join(f'\033[{c}m' for c in codes)
        print(f'{prefix}{text}\033[0m', **print_kwargs)
    else:
        print(*values, **print_kwargs)


def cprint_section(*values, **kwargs):
    """A message framed by horizontal rules (section header)."""
    rule = '-' * 40
    cprint(rule, **kwargs)
    cprint(*values, **kwargs)
    cprint(rule, **kwargs)


def cprint_step(*values, **kwargs):
    """A bold blue progress-step message."""
    kwargs.setdefault('color', 'blue')
    kwargs.setdefault('attrs', ('bold',))
    cprint(*values, **kwargs)
