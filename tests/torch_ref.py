"""Test-only loader for the reference PyTorch model at /root/reference.

Used strictly as a numerical oracle for parity tests: we import the upstream
Depth-Anything-V2 implementation (read-only), run it on CPU with seeded
random weights, and compare our JAX reimplementation against it. The
``torchvision`` import inside the reference is satisfied with a minimal stub
(only ``Compose`` is exercised at inference time).
"""

import sys
import types


def load_reference_dav2():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, sample):
                for fn in self.fns:
                    sample = fn(sample)
                return sample

        class GaussianBlur:  # referenced but unused at inference
            def __init__(self, *a, **k):
                pass

        transforms.Compose = Compose
        transforms.GaussianBlur = GaussianBlur
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDAV2  # noqa: E402

    return TorchDAV2


def build_torch_model(encoder="vits", seed=0):
    import torch

    TorchDAV2 = load_reference_dav2()
    configs = {
        "vits": dict(features=64, out_channels=[48, 96, 192, 384]),
        "vitb": dict(features=128, out_channels=[96, 192, 384, 768]),
        "vitl": dict(features=256, out_channels=[256, 512, 1024, 1024]),
    }
    torch.manual_seed(seed)
    model = TorchDAV2(encoder=encoder, device="cpu", **configs[encoder])
    # Give every parameter non-degenerate random values (many init to zeros).
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.02, generator=gen))
    return model.eval()
