"""Torch twins of the FID-inception and LPIPS-VGG16 detector architectures.

These are test oracles ONLY: independently-written torch implementations of
the same public architectures the JAX detectors port (the FID-community
InceptionV3-2015 variant and the richzhang LPIPS-VGG pipeline), used to
prove *graph parity* of the JAX ports without the real weights (which this
zero-egress image lacks — VERDICT r2 next-step #4).  Random weights flow
torch-state_dict -> tools converter -> flax params, and the two frameworks'
outputs must agree end to end.  The state_dict naming matches what
`convert_torch_inception` / `convert_torch_vgg16` expect (torchvision /
richzhang conventions), which is also what the real checkpoints use.

Reference the oracles stand in for: the NVlabs TorchScript detectors
(reference: stylegan2ada/metrics/frechet_inception_distance.py:23-24,
metric_utils.py:41-52).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3FID(nn.Module):
    """FID inception trunk + 1008-way logits head (torch oracle)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048, pool_mode="max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x, return_logits=False):
        # x: float NCHW in [-1, 1] at 299x299.
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"]:
            x = getattr(self, name)(x)
        feat = x.mean(dim=(2, 3))
        if not return_logits:
            return feat
        return feat, self.fc(feat)


def randomize_inception_(model: TorchInceptionV3FID, seed: int = 0):
    """Random weights AND random BN affine/running stats, so converter BN
    folding is exercised non-trivially."""
    rnd = np.random.RandomState(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = int(np.prod(m.weight.shape[1:]))
                std = float(np.sqrt(2.0 / fan_in))   # He: keeps act scale ~1
                m.weight.copy_(torch.tensor(
                    rnd.randn(*m.weight.shape).astype(np.float32) * std))
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(torch.tensor(
                    (rnd.rand(m.num_features) * 0.5 + 0.75).astype(
                        np.float32)))
                m.bias.copy_(torch.tensor(
                    rnd.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_mean.copy_(torch.tensor(
                    rnd.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.tensor(
                    (rnd.rand(m.num_features) * 0.5 + 0.5).astype(
                        np.float32)))
            elif isinstance(m, nn.Linear):
                m.weight.copy_(torch.tensor(
                    rnd.randn(*m.weight.shape).astype(np.float32) * 0.02))
                m.bias.copy_(torch.tensor(
                    rnd.randn(m.bias.shape[0]).astype(np.float32) * 0.02))
    model.eval()
    return model


# ------------------------------------------------------------- LPIPS-VGG16

_VGG_CFG = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256), "M",
            (256, 512), (512, 512), (512, 512), "M",
            (512, 512), (512, 512), (512, 512)]
_TAP_AFTER = {1, 3, 6, 9, 12}   # conv index (0-based among convs) of taps
_TAP_CH = (64, 128, 256, 512, 512)
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


class TorchVGG16LPIPS(nn.Module):
    """richzhang LPIPS-VGG oracle: [-1,1] NCHW -> LPIPS embedding such that
    ||e0 - e1||^2 == LPIPS distance (mirrors the NVlabs vgg16.pt contract)."""

    def __init__(self, seed: int = 0):
        super().__init__()
        rnd = np.random.RandomState(seed)
        convs = []
        for item in _VGG_CFG:
            if item == "M":
                continue
            ci, co = item
            conv = nn.Conv2d(ci, co, 3, padding=1)
            std = float(np.sqrt(2.0 / (ci * 9)))
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(
                    rnd.randn(co, ci, 3, 3).astype(np.float32) * std))
                conv.bias.copy_(torch.tensor(
                    rnd.randn(co).astype(np.float32) * 0.05))
            convs.append(conv)
        self.convs = nn.ModuleList(convs)
        self.lins = nn.ParameterList([
            nn.Parameter(torch.tensor(
                rnd.rand(c).astype(np.float32) + 0.05))
            for c in _TAP_CH])   # torch-space weights (multiply sq diffs)
        self.eval()

    def state_dict_richzhang(self):
        """The on-disk naming convert_torch_vgg16 parses."""
        # slice grouping: (1: convs 0-1) (2: 2-3) (3: 4-6) (4: 7-9) (5:10-12)
        groups = [(1, [0, 2]), (2, [5, 7]), (3, [10, 12, 14]),
                  (4, [17, 19, 21]), (5, [24, 26, 28])]
        sd, ci = {}, 0
        for g, idxs in groups:
            for idx in idxs:
                sd[f"net.slice{g}.{idx}.weight"] = self.convs[ci].weight.data
                sd[f"net.slice{g}.{idx}.bias"] = self.convs[ci].bias.data
                ci += 1
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.data.view(1, -1, 1, 1)
        return sd

    def forward(self, x):
        x = (x - _SHIFT) / _SCALE
        taps, ci = [], 0
        for item in _VGG_CFG:
            if item == "M":
                x = F.max_pool2d(x, 2, stride=2)
                continue
            x = F.relu(self.convs[ci](x))
            if ci in _TAP_AFTER:
                taps.append(x)
            ci += 1
        pieces = []
        for t, w in zip(taps, self.lins):
            n, c, h, w_ = t.shape
            t = t / torch.sqrt((t ** 2).sum(dim=1, keepdim=True) + 1e-10)
            t = t * torch.sqrt(torch.abs(w)).view(1, -1, 1, 1) / np.sqrt(
                h * w_)
            pieces.append(t.reshape(n, -1))
        return torch.cat(pieces, dim=1)


# ---------------------------------------------------- TorchScript contracts
#
# Scriptable wrappers that reproduce the NVlabs detector-pickle interfaces
# (reference: metric_utils.py:41-52 — `model(uint8 NCHW, **kwargs)` with
# internal resize + normalization), so `torch.jit.script(...)` of an oracle
# yields a real TorchScript file that exercises the EXACT code path real
# weights take through metrics/inception.py / metrics/vgg16_torch.py.


class TorchInceptionV3FIDTS(TorchInceptionV3FID):
    """NVlabs inception-2015-12-05.pt contract: uint8/float NCHW at any
    resolution; internal bilinear resize to 299 (align_corners=False) and
    [-1,1] scaling; `return_features` selects the 2048-D features or the
    1008-way logits."""

    def forward(self, x, return_features: bool = True):
        x = x.to(torch.float32)
        if x.shape[2] != 299 or x.shape[3] != 299:
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
        x = x / 127.5 - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        feat = x.mean(dim=(2, 3))
        if return_features:
            return feat
        return self.fc(feat)


class TorchVGG16LPIPSTS(nn.Module):
    """NVlabs vgg16.pt contract: uint8/float [0,255] NCHW; optional internal
    resize to 256; returns the LPIPS embedding (squared L2 between two
    embeddings == LPIPS distance).  Shares the TorchVGG16LPIPS oracle's
    weights but re-states its forward in scriptable form (no module-level
    tensors / config loops)."""

    def __init__(self, core: TorchVGG16LPIPS):
        super().__init__()
        self.convs = core.convs
        self.register_buffer("shift", _SHIFT.clone())
        self.register_buffer("scale", _SCALE.clone())
        for i, lin in enumerate(core.lins):
            self.register_buffer(f"lin{i}", lin.data.clone())

    def _tap(self, t: torch.Tensor, w: torch.Tensor) -> torch.Tensor:
        n = t.shape[0]
        hw = float(t.shape[2] * t.shape[3])
        t = t / torch.sqrt((t ** 2).sum(dim=1, keepdim=True) + 1e-10)
        t = t * torch.sqrt(torch.abs(w)).view(1, -1, 1, 1) / \
            torch.sqrt(torch.tensor(hw))
        return t.reshape(n, -1)

    def forward(self, x, resize_images: bool = True,
                return_lpips: bool = True):
        assert return_lpips, "only the LPIPS-embedding contract is wrapped"
        x = x.to(torch.float32)
        if resize_images and (x.shape[2] != 256 or x.shape[3] != 256):
            x = F.interpolate(x, size=(256, 256), mode="bilinear",
                              align_corners=False)
        x = x / 127.5 - 1.0
        x = (x - self.shift) / self.scale
        x = F.relu(self.convs[0](x))
        x = F.relu(self.convs[1](x))
        t0 = self._tap(x, self.lin0)
        x = F.max_pool2d(x, 2, stride=2)
        x = F.relu(self.convs[2](x))
        x = F.relu(self.convs[3](x))
        t1 = self._tap(x, self.lin1)
        x = F.max_pool2d(x, 2, stride=2)
        x = F.relu(self.convs[4](x))
        x = F.relu(self.convs[5](x))
        x = F.relu(self.convs[6](x))
        t2 = self._tap(x, self.lin2)
        x = F.max_pool2d(x, 2, stride=2)
        x = F.relu(self.convs[7](x))
        x = F.relu(self.convs[8](x))
        x = F.relu(self.convs[9](x))
        t3 = self._tap(x, self.lin3)
        x = F.max_pool2d(x, 2, stride=2)
        x = F.relu(self.convs[10](x))
        x = F.relu(self.convs[11](x))
        x = F.relu(self.convs[12](x))
        t4 = self._tap(x, self.lin4)
        return torch.cat([t0, t1, t2, t3, t4], dim=1)


def script_inception_oracle(out_path: str, seed: int = 0) -> str:
    """torch.jit.script the randomized inception oracle -> a real
    TorchScript file consumable by metrics/inception.py."""
    model = randomize_inception_(TorchInceptionV3FIDTS(), seed=seed)
    torch.jit.script(model).save(out_path)
    return out_path


def script_vgg16_oracle(out_path: str, seed: int = 0) -> str:
    """torch.jit.script the VGG16-LPIPS oracle -> a real TorchScript file
    consumable by metrics/vgg16_torch.py."""
    model = TorchVGG16LPIPSTS(TorchVGG16LPIPS(seed=seed)).eval()
    torch.jit.script(model).save(out_path)
    return out_path
