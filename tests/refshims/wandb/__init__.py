"""No-op wandb stub for importing reference modules offline."""


class _Noop:
    def __call__(self, *a, **k):
        return None

    def __getattr__(self, name):
        return _Noop()


def __getattr__(name):
    return _Noop()


class Image:
    def __init__(self, *a, **k):
        pass


class Video:
    def __init__(self, *a, **k):
        pass


def log(*a, **k):
    pass


def init(*a, **k):
    return _Noop()
