"""IntermediateLayerGetter — public torchvision API contract: wrap a model,
run its children in registration order, return the requested intermediate
outputs under new names."""

from collections import OrderedDict

from torch import nn


class IntermediateLayerGetter(nn.ModuleDict):
    def __init__(self, model, return_layers):
        if not set(return_layers).issubset(
                name for name, _ in model.named_children()):
            raise ValueError("return_layers are not present in model")
        orig_return_layers = {str(k): str(v) for k, v in return_layers.items()}
        remaining = dict(orig_return_layers)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig_return_layers

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out
