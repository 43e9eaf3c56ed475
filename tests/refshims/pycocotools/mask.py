def frPyObjects(*a, **k):
    raise NotImplementedError("pycocotools shim")


def decode(*a, **k):
    raise NotImplementedError("pycocotools shim")
