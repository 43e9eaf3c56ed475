def save_image(*args, **kwargs):
    raise NotImplementedError("shim: save_image not needed by parity tests")
