"""Shim for the ``path`` (path.py) package — only what the reference uses.

kge/misc.py:58,74 uses ``with Path(dir):`` as a chdir context manager.
"""

import os
import pathlib


class Path(type(pathlib.Path())):
    def __enter__(self):
        self._old_cwd = os.getcwd()
        os.chdir(self)
        return self

    def __exit__(self, *exc):
        os.chdir(self._old_cwd)
        return False
