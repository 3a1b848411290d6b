from .native import ApproxTimeSync, ScanLoader, available, read_scan  # noqa: F401
