class ModelCheckpoint:
    def __init__(self, *a, **k):
        pass


class Callback:
    pass
