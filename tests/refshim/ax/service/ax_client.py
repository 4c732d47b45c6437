class AxClient:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("ax shim: AxSearchJob is not runnable under the parity shim")
