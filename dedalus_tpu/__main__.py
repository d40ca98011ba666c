"""
CLI: python -m dedalus_tpu {test, bench, get_config, get_examples, info}

Parity target: dedalus/__main__.py:1-36.
"""

import pathlib
import shutil
import subprocess
import sys

USAGE = """usage: python -m dedalus_tpu <command>

commands:
  test          run the test suite (pytest)
  bench         run the repo benchmark (bench.py)
  get_config    copy the default config to ./dedalus_tpu.cfg
  get_examples  copy the example scripts to ./dedalus_tpu_examples/
  info          print version, device, and backend information
"""


def main(argv):
    if not argv:
        print(USAGE)
        return 1
    cmd = argv[0]
    repo = pathlib.Path(__file__).parent.parent
    if cmd == 'test':
        return subprocess.call([sys.executable, '-m', 'pytest',
                                str(repo / 'tests'), '-q'] + argv[1:])
    if cmd == 'bench':
        return subprocess.call([sys.executable, str(repo / 'bench.py')] + argv[1:])
    if cmd == 'get_config':
        from .utils.config import DEFAULTS
        lines = []
        for section, opts in DEFAULTS.items():
            lines.append(f'[{section}]')
            lines.extend(f'{k} = {v}' for k, v in opts.items())
            lines.append('')
        pathlib.Path('dedalus_tpu.cfg').write_text('\n'.join(lines))
        print('Wrote dedalus_tpu.cfg')
        return 0
    if cmd == 'get_examples':
        src = repo / 'examples'
        dst = pathlib.Path('dedalus_tpu_examples')
        shutil.copytree(src, dst, dirs_exist_ok=True)
        print(f'Copied examples to {dst}/')
        return 0
    if cmd == 'info':
        import jax
        import dedalus_tpu
        print(f'dedalus_tpu {dedalus_tpu.__version__}')
        print(f'jax {jax.__version__}')
        print(f'devices: {jax.devices()}')
        from .native import get_lib
        print(f'native kernels: {"available" if get_lib() else "unavailable"}')
        return 0
    print(USAGE)
    return 1


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
