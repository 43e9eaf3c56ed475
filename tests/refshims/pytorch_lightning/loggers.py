class WandbLogger:
    def __init__(self, *a, **k):
        pass


class TensorBoardLogger:
    def __init__(self, *a, **k):
        pass
