"""pkg_resources shim (removed from modern setuptools); the reference only
calls get_distribution(...).version at import time."""


class _Dist:
    def __init__(self, name):
        self.project_name = name
        self.version = "0.0-reference"


class DistributionNotFound(Exception):
    pass


def get_distribution(name):
    return _Dist(str(name))
