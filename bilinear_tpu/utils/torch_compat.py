"""Interop with reference (PyTorch) checkpoints — BOTH directions.

Import: converts a torch ``state_dict`` of the reference models into our flax
{params, batch_stats} collections, so real reference checkpoints
(``save/{comment}/parameter/{epoch}.save``) can be evaluated or fine-tuned in
the TPU framework, and so tests can use the reference as a numerics oracle.

Export: converts our trained state back into reference-format torch
checkpoints ({'epoch','step','state','optimizer'}, train_bilinear.py:96-104)
that the reference's own ``model.*.load()`` resumes from — including
optimizer moments — so migration works in both directions
(``save_reference_bilinear_checkpoint`` / ``save_reference_hourglass_checkpoint``).

torch layout -> ours:
- Linear.weight (out,in)        -> Dense.kernel (in,out)   [transpose]
- Conv2d.weight (out,in,kh,kw)  -> Conv.kernel (kh,kw,in,out) [transpose 2,3,1,0]
- BatchNorm.{weight,bias}       -> bn.{scale,bias} in params
- BatchNorm.{running_mean,running_var,num_batches_tracked}
                                -> bn.{mean,var,count} in batch_stats
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    # Works for torch tensors and numpy arrays without importing torch here.
    # Always COPY: torch .numpy() shares storage with the tensor, and on the
    # CPU backend jax.device_put aliases numpy buffers — without the copy, an
    # in-place torch optimizer step would silently mutate converted params.
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.array(t)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _convert_linear(params, module_path, prefix, sd):
    _set(params, module_path + ("kernel",), _np(sd[prefix + ".weight"]).T)
    if prefix + ".bias" in sd:
        _set(params, module_path + ("bias",), _np(sd[prefix + ".bias"]))


def _convert_conv(params, module_path, prefix, sd):
    w = _np(sd[prefix + ".weight"])  # (out, in, kh, kw)
    _set(params, module_path + ("kernel",), w.transpose(2, 3, 1, 0))
    if prefix + ".bias" in sd:
        _set(params, module_path + ("bias",), _np(sd[prefix + ".bias"]))


def _convert_bn(params, batch_stats, module_path, prefix, sd):
    _set(params, module_path + ("scale",), _np(sd[prefix + ".weight"]))
    _set(params, module_path + ("bias",), _np(sd[prefix + ".bias"]))
    _set(batch_stats, module_path + ("mean",), _np(sd[prefix + ".running_mean"]))
    _set(batch_stats, module_path + ("var",), _np(sd[prefix + ".running_var"]))
    nbt = prefix + ".num_batches_tracked"
    count = _np(sd[nbt]).astype(np.int32) if nbt in sd else np.zeros([], np.int32)
    _set(batch_stats, module_path + ("count",), count)


def bilinear_from_torch(state_dict: Mapping[str, Any]):
    """Reference BilinearUnit state_dict (model/bilinear.py:16-29) ->
    (params, batch_stats) for bilinear_tpu.models.bilinear.BilinearUnit."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def heavy(ours: str, theirs: str):
        _convert_linear(params, (ours, "linear"), theirs + ".0", sd)
        _convert_bn(params, stats, (ours, "bn"), theirs + ".1", sd)

    heavy("encode", "encode")
    for b in range(2):
        for s in range(2):
            heavy(f"bilinear_{b}_{s}", f"bilinear.{b}.{s}")
    _convert_linear(params, ("decode",), "decode", sd)
    return params, stats


# Reference BilinearUnit parameter-registration order (what
# model.parameters() yields), mapped to our tree paths. 'T' marks Linear
# weights that transpose (out,in)->(in,out).
def _bilinear_param_order():
    order = []

    def heavy(ours):
        order.extend(
            [
                ((ours, "linear", "kernel"), True),
                ((ours, "linear", "bias"), False),
                ((ours, "bn", "scale"), False),
                ((ours, "bn", "bias"), False),
            ]
        )

    heavy("encode")
    for b in range(2):
        for s in range(2):
            heavy(f"bilinear_{b}_{s}")
    order.append((("decode", "kernel"), True))
    order.append((("decode", "bias"), False))
    return order


def bilinear_optimizer_from_torch(opt_state_dict: Mapping[str, Any]):
    """torch.optim.Adam.state_dict() of the reference BilinearUnit ->
    (count, mu_tree, nu_tree) matching core.optim.TorchAdamState. torch keeps
    a per-param step; the reference steps all params together, so any one
    equals our shared count."""
    order = _bilinear_param_order()
    torch_state = opt_state_dict["state"]
    param_ids = []
    for group in opt_state_dict["param_groups"]:
        param_ids.extend(group["params"])
    assert len(param_ids) == len(order), (len(param_ids), len(order))

    mu: Dict[str, Any] = {}
    nu: Dict[str, Any] = {}
    count = 0
    for pid, (path, transpose) in zip(param_ids, order):
        entry = torch_state.get(pid, {})
        if not entry:
            continue
        count = int(_np(entry["step"]))
        m = _np(entry["exp_avg"])
        v = _np(entry["exp_avg_sq"])
        if transpose:
            m, v = m.T, v.T
        _set(mu, path, m)
        _set(nu, path, v)
    return count, mu, nu


def load_reference_bilinear_checkpoint(path: str, template_state):
    """Load a reference ``{epoch}.save`` torch checkpoint
    ({'epoch','step','state','optimizer'}, train_bilinear.py:96-104) into a
    TrainState, including the Adam moments — a true drop-in migration from
    the reference framework. Returns (state, epoch)."""
    import torch

    import jax.numpy as jnp
    from flax import serialization

    payload = torch.load(path, map_location="cpu", weights_only=False)
    params, stats = bilinear_from_torch(payload["state"])
    count, mu, nu = bilinear_optimizer_from_torch(payload["optimizer"])

    new_params = serialization.from_state_dict(template_state.params, params)
    new_stats = serialization.from_state_dict(template_state.batch_stats, stats)

    # opt_state = (clip EmptyState, TorchAdamState(count, mu, nu))
    clip_state, adam = template_state.opt_state
    adam = adam._replace(
        count=jnp.asarray(count, jnp.int32),
        mu=serialization.from_state_dict(adam.mu, mu) if mu else adam.mu,
        nu=serialization.from_state_dict(adam.nu, nu) if nu else adam.nu,
    )
    return (
        template_state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=(clip_state, adam),
            step=jnp.asarray(payload["step"], jnp.int32),
        ),
        payload["epoch"],
    )


def hourglass_torch7_from_torch(state_dict: Mapping[str, Any], n_stacks: int = 8,
                                n_depth: int = 4):
    """Reference MainModel state_dict (model/hourglass_torch7.py:80-105) ->
    (params, batch_stats) for models.hourglass_torch7.MainModel.

    nModules (CONFIG.nModules Sequentials at :47-49,58) is auto-detected
    from the state_dict, so reference checkpoints trained at ANY nModules
    import losslessly; build the target model with the same n_modules."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    n_modules = 1
    while f"hgArray.0.res1.{n_modules}.resSeq.0.weight" in sd:
        n_modules += 1

    def slot_name(slot: str, k: int) -> str:
        return slot if k == 0 else f"{slot}_m{k}"

    def res_module(ours: Tuple[str, ...], theirs: str):
        # ResModule: conv_skip + resSeq = BN,ReLU,Conv1,BN,ReLU,Conv3,BN,ReLU,Conv1
        if theirs + ".conv_skip.weight" in sd:
            _convert_conv(params, ours + ("conv_skip",), theirs + ".conv_skip", sd)
        _convert_bn(params, stats, ours + ("bn1",), theirs + ".resSeq.0", sd)
        _convert_conv(params, ours + ("conv1",), theirs + ".resSeq.2", sd)
        _convert_bn(params, stats, ours + ("bn2",), theirs + ".resSeq.3", sd)
        _convert_conv(params, ours + ("conv2",), theirs + ".resSeq.5", sd)
        _convert_bn(params, stats, ours + ("bn3",), theirs + ".resSeq.6", sd)
        _convert_conv(params, ours + ("conv3",), theirs + ".resSeq.8", sd)

    def hourglass(ours: Tuple[str, ...], theirs: str, depth: int):
        for k in range(n_modules):
            res_module(ours + (slot_name("res1", k),), theirs + f".res1.{k}")
            res_module(ours + (slot_name("res2", k),), theirs + f".res2.{k}")
            res_module(ours + (slot_name("res3", k),), theirs + f".res3.{k}")
        if depth > 1:
            hourglass(ours + ("sub",), theirs + ".subHourglass", depth - 1)
        else:
            for k in range(n_modules):
                res_module(ours + (slot_name("waist", k),),
                           theirs + f".resWaist.{k}")

    # Stem: Conv7x7, BN, ReLU, ResModule, MaxPool, ResModule, ResModule
    _convert_conv(params, ("stem_conv",), "beforeHourglass.0", sd)
    _convert_bn(params, stats, ("stem_bn",), "beforeHourglass.1", sd)
    res_module(("stem_res1",), "beforeHourglass.3")
    res_module(("stem_res2",), "beforeHourglass.5")
    res_module(("stem_res3",), "beforeHourglass.6")

    for i in range(n_stacks):
        hourglass((f"hg_{i}",), f"hgArray.{i}", n_depth)
        _convert_conv(params, (f"lin_{i}", "conv"), f"linArray.{i}.0", sd)
        _convert_bn(params, stats, (f"lin_{i}", "bn"), f"linArray.{i}.1", sd)
        _convert_conv(params, (f"htmap_{i}",), f"htmapArray.{i}", sd)
    for i in range(n_stacks - 1):
        _convert_conv(params, (f"ll_bar_{i}",), f"llBarArray.{i}", sd)
        _convert_conv(params, (f"htmap_bar_{i}",), f"htmapBarArray.{i}", sd)
    return params, stats


def hourglass_from_torch(state_dict: Mapping[str, Any], n_stacks: int = 8,
                         compression_time: int = 4):
    """Reference StackedHourglass state_dict (model/hourglass.py:92-151) ->
    (params, batch_stats) for models.hourglass.StackedHourglass."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def light(ours: Tuple[str, ...], theirs: str):
        # light_conv: BN(momentum=None), ReLU, Conv (model/hourglass.py:7-12)
        _convert_bn(params, stats, ours + ("bn",), theirs + ".0", sd)
        _convert_conv(params, ours + ("conv",), theirs + ".2", sd)

    def res_unit(ours: Tuple[str, ...], theirs: str):
        # ResUnit: heavy_conv (3x light_conv) + optional 1x1 skip conv
        light(ours + ("light1",), theirs + ".conv.0")
        light(ours + ("light2",), theirs + ".conv.1")
        light(ours + ("light3",), theirs + ".conv.2")
        if theirs + ".skip.weight" in sd:
            _convert_conv(params, ours + ("skip",), theirs + ".skip", sd)

    def hourglass(ours: Tuple[str, ...], theirs: str):
        for t in range(compression_time):
            res_unit(ours + (f"skip_{t}",), f"{theirs}.skip_connection.{t}")
            res_unit(ours + (f"down_{t}",), f"{theirs}.downscale.{t}.1")
            res_unit(ours + (f"up_{t}",), f"{theirs}.upscale.{t}.0")
        res_unit(ours + ("waist",), theirs + ".res")

    _convert_conv(params, ("stem_conv",), "feature_extraction.0", sd)
    res_unit(("stem_res1",), "feature_extraction.1")
    res_unit(("stem_res2",), "feature_extraction.3")
    res_unit(("stem_res3",), "feature_extraction.4")

    for i in range(n_stacks):
        hourglass((f"hg_{i}",), f"hourglass.{i}")
        res_unit((f"prev_{i}", "res"), f"prev_heatmap.{i}.0")
        light((f"prev_{i}", "light"), f"prev_heatmap.{i}.1")
        light((f"heatmap_{i}",), f"heatmap_intermediate.{i}")
        light((f"after_{i}",), f"after_heatmap.{i}")
        light((f"skip_{i}",), f"skip_intermediate.{i}")
    return params, stats


# ---------------------------------------------------------------------------
# Export: our flax state -> reference torch checkpoints (the other direction)
# ---------------------------------------------------------------------------

def _get(tree, path: Tuple[str, ...]):
    node = tree
    for key in path:
        if node is None or key not in node:
            return None
        node = node[key]
    return node


def _arr(x) -> np.ndarray:
    # torch reference models are float32; our leaves may be bf16/f64. Always
    # COPY: jax arrays expose read-only buffers, which torch.from_numpy
    # rejects (and aliasing a live device buffer would be unsafe anyway).
    return np.array(np.asarray(x), dtype=np.float32)


class _TorchExport:
    """Walk our {params, batch_stats} trees and emit a reference-layout
    state_dict (insertion order == torch registration order) plus a spec of
    (torch_key, our_leaf_path, inverse_transform) for every TRAINABLE param,
    in ``model.parameters()`` order — that order defines the integer param
    ids in torch optimizer state_dicts."""

    def __init__(self, params, batch_stats):
        self.params = params
        self.stats = batch_stats
        self.sd: Dict[str, np.ndarray] = {}
        self.spec = []  # (torch_key, our_path_or_None, kind)

    def _emit(self, key, value, path, kind):
        self.sd[key] = value
        self.spec.append((key, path, kind))

    def linear(self, path: Tuple[str, ...], prefix: str):
        node = _get(self.params, path)
        self._emit(prefix + ".weight", _arr(node["kernel"]).T,
                   path + ("kernel",), "linear_w")
        if "bias" in node:
            self._emit(prefix + ".bias", _arr(node["bias"]),
                       path + ("bias",), "plain")

    def conv(self, path: Tuple[str, ...], prefix: str, zeros_shape=None):
        """zeros_shape=(out,in): emit a fresh zero 1x1 conv when our tree has
        none — the reference torch7 ResModule registers conv_skip even when
        in==out and never uses it (model/hourglass_torch7.py:19,33-37)."""
        node = _get(self.params, path)
        if node is None:
            if zeros_shape is None:
                return
            co, ci = zeros_shape
            self._emit(prefix + ".weight", np.zeros((co, ci, 1, 1), np.float32),
                       None, "plain")
            self._emit(prefix + ".bias", np.zeros((co,), np.float32),
                       None, "plain")
            return
        self._emit(prefix + ".weight", _arr(node["kernel"]).transpose(3, 2, 0, 1),
                   path + ("kernel",), "conv_w")
        if "bias" in node:
            self._emit(prefix + ".bias", _arr(node["bias"]),
                       path + ("bias",), "plain")

    def bn(self, path: Tuple[str, ...], prefix: str):
        pnode = _get(self.params, path)
        snode = _get(self.stats, path)
        self._emit(prefix + ".weight", _arr(pnode["scale"]), path + ("scale",), "plain")
        self._emit(prefix + ".bias", _arr(pnode["bias"]), path + ("bias",), "plain")
        # Buffers: present in state_dict, absent from parameters().
        self.sd[prefix + ".running_mean"] = _arr(snode["mean"])
        self.sd[prefix + ".running_var"] = _arr(snode["var"])
        self.sd[prefix + ".num_batches_tracked"] = np.array(
            snode["count"], np.int64)

    def moment(self, tree, path, kind):
        """Fetch an optimizer-moment leaf for torch param ``key`` and undo our
        layout transform."""
        leaf = _arr(_get(tree, path))
        if kind == "linear_w":
            return leaf.T
        if kind == "conv_w":
            return leaf.transpose(3, 2, 0, 1)
        return leaf


def bilinear_to_torch_state(params, batch_stats) -> _TorchExport:
    """Our BilinearUnit {params, batch_stats} -> reference BilinearUnit
    state_dict layout (model/bilinear.py:16-29). Exact inverse of
    bilinear_from_torch."""
    ex = _TorchExport(params, batch_stats)

    def heavy(ours: str, theirs: str):
        ex.linear((ours, "linear"), theirs + ".0")
        ex.bn((ours, "bn"), theirs + ".1")

    heavy("encode", "encode")
    for b in range(2):
        for s in range(2):
            heavy(f"bilinear_{b}_{s}", f"bilinear.{b}.{s}")
    ex.linear(("decode",), "decode")
    return ex


def hourglass_torch7_to_torch_state(params, batch_stats) -> _TorchExport:
    """Our MainModel tree -> reference MainModel state_dict
    (model/hourglass_torch7.py:76-103). Config (stacks/features/depth) is
    inferred from the tree. Emission order matches torch registration order
    (beforeHourglass, hgArray.*, linArray.*, htmapArray.*, llBarArray.*,
    htmapBarArray.*) so spec order == model.parameters() order."""
    n_stacks = sum(1 for k in params if k.startswith("htmap_")
                   and not k.startswith("htmap_bar_"))
    features = int(np.shape(params["htmap_0"]["kernel"])[2])
    depth, node = 1, params["hg_0"]
    while "sub" in node:
        depth, node = depth + 1, node["sub"]

    ex = _TorchExport(params, batch_stats)

    def res_module(ours, theirs, ci, co):
        ex.conv(ours + ("conv_skip",), theirs + ".conv_skip",
                zeros_shape=(co, ci))
        ex.bn(ours + ("bn1",), theirs + ".resSeq.0")
        ex.conv(ours + ("conv1",), theirs + ".resSeq.2")
        ex.bn(ours + ("bn2",), theirs + ".resSeq.3")
        ex.conv(ours + ("conv2",), theirs + ".resSeq.5")
        ex.bn(ours + ("bn3",), theirs + ".resSeq.6")
        ex.conv(ours + ("conv3",), theirs + ".resSeq.8")

    n_modules = 1
    while f"res1_m{n_modules}" in params["hg_0"]:
        n_modules += 1

    def slot_name(slot, k):
        return slot if k == 0 else f"{slot}_m{k}"

    def hourglass(ours, theirs, d):
        # torch registers each Sequential wholesale (res1.0..res1.{n-1},
        # then res2.*, then res3.*) — emission must follow that order.
        for slot, t_slot in (("res1", "res1"), ("res2", "res2"),
                             ("res3", "res3")):
            for k in range(n_modules):
                res_module(ours + (slot_name(slot, k),),
                           theirs + f".{t_slot}.{k}", features, features)
        if d > 1:
            hourglass(ours + ("sub",), theirs + ".subHourglass", d - 1)
        else:
            for k in range(n_modules):
                res_module(ours + (slot_name("waist", k),),
                           theirs + f".resWaist.{k}", features, features)

    ex.conv(("stem_conv",), "beforeHourglass.0")
    ex.bn(("stem_bn",), "beforeHourglass.1")
    res_module(("stem_res1",), "beforeHourglass.3", 64, 128)
    res_module(("stem_res2",), "beforeHourglass.5", 128, 128)
    res_module(("stem_res3",), "beforeHourglass.6", 128, features)
    for i in range(n_stacks):
        hourglass((f"hg_{i}",), f"hgArray.{i}", depth)
    for i in range(n_stacks):
        ex.conv((f"lin_{i}", "conv"), f"linArray.{i}.0")
        ex.bn((f"lin_{i}", "bn"), f"linArray.{i}.1")
    for i in range(n_stacks):
        ex.conv((f"htmap_{i}",), f"htmapArray.{i}")
    for i in range(n_stacks - 1):
        ex.conv((f"ll_bar_{i}",), f"llBarArray.{i}")
    for i in range(n_stacks - 1):
        ex.conv((f"htmap_bar_{i}",), f"htmapBarArray.{i}")
    return ex


def hourglass_to_torch_state(params, batch_stats) -> _TorchExport:
    """Our StackedHourglass (pre-act) tree -> reference StackedHourglass
    state_dict (model/hourglass.py:92-151). Emission order matches torch
    registration order (feature_extraction, hourglass.*, prev_heatmap.*,
    heatmap_intermediate.*, after_heatmap.*, skip_intermediate.*; within a
    Hourglass: skip_connection.*, downscale.*, res, upscale.*)."""
    n_stacks = sum(1 for k in params if k.startswith("heatmap_"))
    compression_time = sum(1 for k in params["hg_0"] if k.startswith("skip_"))

    ex = _TorchExport(params, batch_stats)

    def light(ours, theirs):
        ex.bn(ours + ("bn",), theirs + ".0")
        ex.conv(ours + ("conv",), theirs + ".2")

    def res_unit(ours, theirs):
        light(ours + ("light1",), theirs + ".conv.0")
        light(ours + ("light2",), theirs + ".conv.1")
        light(ours + ("light3",), theirs + ".conv.2")
        ex.conv(ours + ("skip",), theirs + ".skip")  # only when allocated

    def hourglass(ours, theirs):
        for t in range(compression_time):
            res_unit(ours + (f"skip_{t}",), f"{theirs}.skip_connection.{t}")
        for t in range(compression_time):
            res_unit(ours + (f"down_{t}",), f"{theirs}.downscale.{t}.1")
        res_unit(ours + ("waist",), theirs + ".res")
        for t in range(compression_time):
            res_unit(ours + (f"up_{t}",), f"{theirs}.upscale.{t}.0")

    ex.conv(("stem_conv",), "feature_extraction.0")
    res_unit(("stem_res1",), "feature_extraction.1")
    res_unit(("stem_res2",), "feature_extraction.3")
    res_unit(("stem_res3",), "feature_extraction.4")
    for i in range(n_stacks):
        hourglass((f"hg_{i}",), f"hourglass.{i}")
    for i in range(n_stacks):
        res_unit((f"prev_{i}", "res"), f"prev_heatmap.{i}.0")
        light((f"prev_{i}", "light"), f"prev_heatmap.{i}.1")
    for i in range(n_stacks):
        light((f"heatmap_{i}",), f"heatmap_intermediate.{i}")
    for i in range(n_stacks):
        light((f"after_{i}",), f"after_heatmap.{i}")
    for i in range(n_stacks):
        light((f"skip_{i}",), f"skip_intermediate.{i}")
    return ex


def _torch_param_groups(optimizer_cls, lr: float):
    """Version-correct default param_group dict: pulled from a live torch
    optimizer so the reference's optimizer.load_state_dict + step() find
    every hyperparameter key this torch build expects."""
    import torch

    dummy = torch.nn.Parameter(torch.zeros(1))
    group = dict(optimizer_cls([dummy], lr=lr).state_dict()["param_groups"][0])
    return group


def _torch_optimizer_export(ex: _TorchExport, moments: Dict[str, Any],
                            count: int, optimizer_cls, lr: float):
    """Build a torch optimizer state_dict: integer param ids follow
    ``ex.spec`` order (== model.parameters() order); each id gets the mapped
    moment entries from ``moments`` ({torch_state_key: our_tree}); fresh
    zero-emitted params (path None) get no state, like untouched torch
    params."""
    import torch

    state = {}
    for pid, (key, path, kind) in enumerate(ex.spec):
        if path is None:
            continue
        entry = {"step": torch.tensor(float(count))}
        for torch_key, tree in moments.items():
            entry[torch_key] = torch.from_numpy(ex.moment(tree, path, kind))
        state[pid] = entry
    group = _torch_param_groups(optimizer_cls, lr)
    group["params"] = list(range(len(ex.spec)))
    return {"state": state, "param_groups": [group]}


def _find_opt_leaf_state(opt_state, fields: Tuple[str, ...]):
    """Locate the optimizer-state NamedTuple carrying the given fields in an
    optax.chain state tuple."""
    for part in opt_state:
        if all(hasattr(part, f) for f in fields):
            return part
    raise ValueError(f"no optimizer state with fields {fields} in {type(opt_state)}")


def save_reference_bilinear_checkpoint(path: str, state, epoch: int,
                                       learning_rate: float = 1e-3) -> None:
    """Write our TrainState as a reference-format ``{epoch}.save`` torch
    checkpoint ({'epoch','step','state','optimizer'}) that the reference's
    ``model.bilinear.load`` (model/bilinear.py:58-92) resumes from, Adam
    moments included."""
    import torch

    ex = bilinear_to_torch_state(state.params, state.batch_stats)
    adam = _find_opt_leaf_state(state.opt_state, ("count", "mu", "nu"))
    optimizer = _torch_optimizer_export(
        ex, {"exp_avg": adam.mu, "exp_avg_sq": adam.nu}, int(adam.count),
        torch.optim.Adam, learning_rate)
    torch.save(
        {"epoch": int(epoch), "step": int(state.step),
         "state": {k: torch.from_numpy(v) for k, v in ex.sd.items()},
         "optimizer": optimizer},
        path,
    )


def save_reference_hourglass_checkpoint(path: str, state, epoch: int,
                                        family: str = "torch7",
                                        learning_rate: float = 2.5e-4) -> None:
    """Write our detector TrainState as a reference-format torch checkpoint
    that ``model.hourglass_torch7.load`` / ``model.hourglass.load`` resumes
    from (RMSprop square_avg moments included). family: 'torch7' (MainModel)
    or 'preact' (StackedHourglass)."""
    import torch

    to_torch = (hourglass_torch7_to_torch_state if family == "torch7"
                else hourglass_to_torch_state)
    ex = to_torch(state.params, state.batch_stats)
    rms = _find_opt_leaf_state(state.opt_state, ("count", "square_avg"))
    optimizer = _torch_optimizer_export(
        ex, {"square_avg": rms.square_avg}, int(rms.count),
        torch.optim.RMSprop, learning_rate)
    torch.save(
        {"epoch": int(epoch), "step": int(state.step),
         "state": {k: torch.from_numpy(v) for k, v in ex.sd.items()},
         "optimizer": optimizer},
        path,
    )
