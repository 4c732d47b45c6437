"""Import-only shim for ax-platform so kge.job imports (kge/job/search_ax.py).

The parity tests never run AxSearchJob; these names only need to exist.
"""


class Models:
    SOBOL = "SOBOL"
    GPEI = "GPEI"
    BOTORCH = "BOTORCH"
