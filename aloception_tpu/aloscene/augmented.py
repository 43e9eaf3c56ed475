"""Augmented arrays: the core labeled-data structure of the framework.

TPU-native re-design of the reference's ``AugmentedTensor``
(/root/reference/aloscene/tensors/augmented_tensor.py:29).  The reference
subclasses ``torch.Tensor`` and intercepts every torch op through
``__torch_function__`` (augmented_tensor.py:604) to re-attach labels.  JAX has
no tensor subclassing; the idiomatic equivalent is a **registered pytree
node**: a plain Python container holding

- ``array``      -- the payload (numpy on host, jax.Array on device) [pytree leaf]
- ``names``      -- named dims ("B","T","C","H","W","N", or None)    [static]
- *properties*   -- static metadata (normalization, box format, ...)  [static]
- *children*     -- labels that transform together with the parent    [pytree leaves]

Because every subclass is registered with ``jax.tree_util``, augmented arrays
flow through ``jax.jit`` / ``jax.device_put`` / optimizer pytrees natively:
metadata lands in the (hashed) treedef, arrays in the leaves.  Geometric ops
(hflip/vflip/resize/rotate/crop/pad/spatial_shift) are pure functions that
recursively dispatch to children, mirroring the reference's
``recursive_apply_on_children_`` contract (augmented_tensor.py:854-1088).

Host-side label geometry uses numpy semantics (shape-changing ops like the
area>0 filter after crop are data-pipeline-only); shape-preserving ops trace
fine under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp


ArrayLike = Union[np.ndarray, jax.Array, list, tuple, float, int]


def xp(a):
    """Array module matching ``a``: numpy for host data, jnp otherwise."""
    return np if isinstance(a, np.ndarray) else jnp


def _is_concrete(a) -> bool:
    return isinstance(a, np.ndarray) or (
        isinstance(a, jax.Array) and not isinstance(a, jax.core.Tracer)
    )


class AugmentedArray:
    """Base class for all augmented array types.

    Mirrors the public surface of the reference ``AugmentedTensor``
    (augmented_tensor.py:42-1088): named dims, dynamic properties, children
    that transform with the parent, merge machinery, recursive geometric ops.
    """

    # Subclasses override to pre-declare child slots (name -> meta dict).
    # Instances may also declare at construction time via add_child.

    def __init__(self, x: ArrayLike, names: Optional[Sequence[Optional[str]]] = None,
                 dtype=None):
        if isinstance(x, AugmentedArray):
            x = x.array
        if not isinstance(x, (np.ndarray, jax.Array)):
            x = np.asarray(x, dtype=dtype if dtype is not None else np.float32)
        elif dtype is not None:
            x = x.astype(dtype)
        if isinstance(x, np.ndarray) and x.dtype == np.float64:
            x = x.astype(np.float32)
        self.array = x
        if names is None:
            names = (None,) * x.ndim
        names = tuple(names)
        if len(names) != x.ndim:
            raise ValueError(
                f"names {names} do not match array rank {x.ndim} (shape {x.shape})")
        self._names: Tuple[Optional[str], ...] = names
        self._properties: Dict[str, Any] = {}
        self._children: Dict[str, Any] = {}
        self._child_meta: Dict[str, Dict[str, Any]] = {}

    # ------------------------------------------------------------------
    # pytree protocol — auto-registration of every subclass
    # ------------------------------------------------------------------
    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(cls, cls._tree_flatten, cls._tree_unflatten)

    def _tree_flatten(self):
        child_names = tuple(sorted(self._children))
        leaves = (self.array, tuple(self._children[k] for k in child_names))
        meta = tuple(
            (k, tuple(sorted(self._child_meta[k].items()))) for k in child_names
        )
        props = tuple(sorted(self._properties.items(), key=lambda kv: kv[0]))
        aux = (self._names, props, meta)
        return leaves, aux

    @classmethod
    def _tree_unflatten(cls, aux, leaves):
        names, props, meta = aux
        array, children = leaves
        obj = object.__new__(cls)
        obj.array = array
        obj._names = names
        obj._properties = dict(props)
        obj._child_meta = {k: dict(m) for k, m in meta}
        obj._children = {k: c for (k, _), c in zip(meta, children)}
        return obj

    # ------------------------------------------------------------------
    # properties / children declaration (augmented_tensor.py:165-259)
    # ------------------------------------------------------------------
    def add_property(self, name: str, value: Any):
        self._properties[name] = value

    def add_child(self, name: str, value: Any = None, align_dim: Sequence[str] = ("B", "T"),
                  mergeable: bool = True):
        """Declare a child slot (a label that transforms with the parent)."""
        self._child_meta[name] = {"align_dim": tuple(align_dim), "mergeable": mergeable}
        if name not in self._children:
            self._children[name] = None
        if value is not None:
            if isinstance(value, dict):
                for k, v in value.items():
                    self._append_child(name, v, k)
            else:
                self._append_child(name, value)

    def _append_child(self, name: str, value: Any, set_name: Optional[str] = None):
        """Attach a child, optionally into a named set (augmented_tensor.py:224)."""
        if name not in self._child_meta:
            self.add_child(name, None)
        cur = self._children.get(name)
        if set_name is None:
            if cur is None:
                self._children[name] = value
            elif isinstance(cur, dict):
                raise ValueError(
                    f"child '{name}' holds a named set; an explicit name is required")
            else:
                raise ValueError(
                    f"an unnamed '{name}' child is already attached; use a name")
        else:
            if cur is None:
                self._children[name] = {set_name: value}
            elif isinstance(cur, dict):
                cur[set_name] = value
            else:
                raise ValueError(
                    f"child '{name}' already holds an unnamed value; "
                    "cannot mix named and unnamed children")

    def get_children(self) -> Dict[str, Any]:
        return dict(self._children)

    def set_children(self, children: Dict[str, Any]):
        for k, v in children.items():
            if k not in self._child_meta:
                self.add_child(k, None)
            self._children[k] = v
        return self

    def drop_children(self) -> Dict[str, Any]:
        """Detach and return all children (augmented_tensor.py:78)."""
        children = dict(self._children)
        for k in self._children:
            self._children[k] = None
        return children

    def get_child(self, name: str):
        return self._children.get(name)

    @staticmethod
    def apply_on_child(child, fn: Callable, on_list: bool = True):
        """Apply ``fn`` on a child slot, mapping over named sets and lists
        (augmented_tensor.py:110)."""
        if child is None:
            return None
        if isinstance(child, dict):
            return {k: AugmentedArray.apply_on_child(v, fn, on_list) for k, v in child.items()}
        if isinstance(child, list):
            if on_list:
                return [AugmentedArray.apply_on_child(v, fn, on_list) for v in child]
            return fn(child)
        return fn(child)

    def recursive_apply_on_children(self, fn: Callable) -> "AugmentedArray":
        """Replace every child with fn(child), recursing (augmented_tensor.py:840)."""
        def _apply(c):
            return fn(c).recursive_apply_on_children(fn)
        for name in self._children:
            self._children[name] = self.apply_on_child(self._children[name], _apply)
        return self

    # ------------------------------------------------------------------
    # attribute sugar: properties and children are readable/writable attrs
    # ------------------------------------------------------------------
    def __getattr__(self, name: str):
        # only called when normal lookup fails
        if name.startswith("_"):
            raise AttributeError(name)
        props = self.__dict__.get("_properties")
        if props is not None and name in props:
            return props[name]
        children = self.__dict__.get("_children")
        if children is not None and name in children:
            return children[name]
        raise AttributeError(f"{type(self).__name__} has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any):
        if not name.startswith("_") and name not in ("array",):
            props = self.__dict__.get("_properties")
            if props is not None and name in props:
                props[name] = value
                return
            children = self.__dict__.get("_children")
            if children is not None and name in children:
                children[name] = value
                return
        object.__setattr__(self, name, value)

    # ------------------------------------------------------------------
    # array-protocol surface
    # ------------------------------------------------------------------
    @property
    def names(self) -> Tuple[Optional[str], ...]:
        return self._names

    @property
    def shape(self):
        return self.array.shape

    @property
    def ndim(self) -> int:
        return self.array.ndim

    @property
    def dtype(self):
        return self.array.dtype

    def size(self, name: str) -> int:
        return self.shape[self.dim_idx(name)]

    def dim_idx(self, name: str) -> int:
        try:
            return self._names.index(name)
        except ValueError:
            raise ValueError(f"dim '{name}' not in names {self._names}")

    def has_dim(self, name: str) -> bool:
        return name in self._names

    def get_slices(self, dim_slices: Dict[str, Any], default=slice(None)) -> Tuple:
        """Build an indexing tuple from named-dim slices
        (mirrors augmented_tensor get_slices usage)."""
        return tuple(
            dim_slices.get(n, default) if n is not None else default for n in self._names
        )

    def as_array(self):
        """Raw payload array (analog of ``as_tensor``, augmented_tensor.py:750)."""
        return self.array

    def as_numpy(self) -> np.ndarray:
        return np.asarray(self.array)

    def to_device(self, device=None, sharding=None) -> "AugmentedArray":
        """Recursively move payload + children to a jax device/sharding
        (analog of recursive ``.to()``, augmented_tensor.py:369-433)."""
        target = sharding if sharding is not None else device
        return jax.device_put(self, target) if target is not None else jax.device_put(self)

    def cpu(self) -> "AugmentedArray":
        return jax.tree_util.tree_map(lambda a: np.asarray(a), self)

    def astype(self, dtype) -> "AugmentedArray":
        n = self.clone()
        n.array = n.array.astype(dtype)
        return n

    def clone(self) -> "AugmentedArray":
        """Recursive copy. Arrays are immutable in JAX, so payloads are shared;
        container structure is deep-copied."""
        leaves, treedef = jax.tree_util.tree_flatten(self)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # construct "same type, new payload, same metadata/children"
    def _with_array(self, array, names: Optional[Tuple] = None) -> "AugmentedArray":
        obj = object.__new__(type(self))
        obj.array = array
        obj._names = self._names if names is None else tuple(names)
        obj._properties = dict(self._properties)
        obj._child_meta = {k: dict(v) for k, v in self._child_meta.items()}
        obj._children = dict(self._children)
        return obj

    # arithmetic keeps metadata + children (the common-case merge rule of the
    # reference's __torch_function__ handler)
    def _binop(self, other, fn):
        o = other.array if isinstance(other, AugmentedArray) else other
        return self._with_array(fn(self.array, o))

    def __add__(self, o): return self._binop(o, lambda a, b: a + b)
    def __radd__(self, o): return self._binop(o, lambda a, b: b + a)
    def __sub__(self, o): return self._binop(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._binop(o, lambda a, b: b - a)
    def __mul__(self, o): return self._binop(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._binop(o, lambda a, b: b * a)
    def __truediv__(self, o): return self._binop(o, lambda a, b: a / b)
    def __rtruediv__(self, o): return self._binop(o, lambda a, b: b / a)
    def __neg__(self): return self._with_array(-self.array)

    def __len__(self):
        return self.shape[0]

    def __repr__(self):
        props = ", ".join(f"{k}={v}" for k, v in self._properties.items())
        kids = {k: (type(v).__name__ if not isinstance(v, (dict, list)) else v.__class__.__name__)
                for k, v in self._children.items() if v is not None}
        return (f"{type(self).__name__}(shape={tuple(self.shape)}, names={self._names}"
                + (f", {props}" if props else "")
                + (f", children={kids}" if kids else "") + ")")

    # ------------------------------------------------------------------
    # getitem with child propagation (augmented_tensor.py:262-348)
    # ------------------------------------------------------------------
    def __getitem__(self, idx):
        if isinstance(idx, (np.ndarray, jax.Array)) and getattr(idx, "dtype", None) is not None \
                and idx.dtype == bool:
            # boolean mask over leading dim: filter, propagate to aligned children
            new = self._with_array(self.array[np.asarray(idx)])
            lead = self._names[0]

            def _filter(c):
                if isinstance(c, AugmentedArray) and c.shape[0] == len(idx):
                    return c[idx]
                return c
            new._children = {k: self.apply_on_child(v, _filter) for k, v in self._children.items()}
            return new

        if isinstance(idx, int):
            idx = (idx,)
        if isinstance(idx, slice):
            idx = (idx,)
        if not isinstance(idx, tuple):
            raise TypeError(f"unsupported index {idx!r}")

        new_array = self.array[idx]
        # compute new names: ints drop dims
        n_names: List[Optional[str]] = []
        dim = 0
        for sl in idx:
            if sl is Ellipsis:
                n_skip = self.ndim - (len(idx) - 1)
                n_names.extend(self._names[dim:dim + n_skip])
                dim += n_skip
            elif isinstance(sl, int):
                dim += 1
            else:
                n_names.append(self._names[dim])
                dim += 1
        n_names.extend(self._names[dim:])
        new = self._with_array(new_array, names=tuple(n_names))

        def _slice_slot(v, k):
            if v is None:
                return None
            if isinstance(v, dict):  # named set: recurse per name
                return {kk: _slice_slot(vv, k) for kk, vv in v.items()}
            # lists are handled inside _getitem_child (list-of-items indexing)
            return self._getitem_child(v, k, idx)

        new._children = {k: _slice_slot(v, k) for k, v in self._children.items()}
        return new

    def _getitem_child(self, child, child_name: str, idx):
        """Propagate parent indexing to a child (augmented_tensor.py:262-348).

        Children aligned on B/T share those leading dims with the parent, in
        the same order; an int/slice on an aligned parent dim is applied at
        the child's corresponding leading dim.  Unaligned dims (C, H, W for
        non-spatial children) are skipped.
        """
        meta = self._child_meta[child_name]
        child_dim = 0
        out = child
        parent_dim = 0
        for sl in (idx if isinstance(idx, tuple) else (idx,)):
            if sl is Ellipsis:
                parent_dim += self.ndim - (len(idx) - 1)
                continue
            name = self._names[parent_dim]
            parent_dim += 1
            if name not in meta["align_dim"]:
                continue
            trivial = isinstance(sl, slice) and sl == slice(None)
            if not trivial:
                if isinstance(out, list):
                    out = out[sl]
                    if isinstance(sl, slice):
                        child_dim += 1
                    continue
                if isinstance(out, AugmentedArray):
                    key = (slice(None),) * child_dim + (sl,)
                    out = out[key]
            if isinstance(sl, slice):
                child_dim += 1
        return out

    # ------------------------------------------------------------------
    # recursive geometric ops (augmented_tensor.py:854-1088)
    # ------------------------------------------------------------------
    def _children_op_kwargs(self, op: str, kwargs: dict) -> dict:
        """Extra context injected into child geometric ops; spatial parents
        add frame_size / camera calib (spatial_augmented_tensor.py:445-476,589)."""
        return kwargs

    def hflip(self, **kwargs):
        """Horizontal flip of self + all children (augmented_tensor.py:867)."""
        ck = self._children_op_kwargs("_hflip", kwargs)
        flipped = self._hflip(**kwargs)
        flipped.recursive_apply_on_children(lambda c: _child_op(c, "_hflip", **ck))
        return flipped

    def vflip(self, **kwargs):
        ck = self._children_op_kwargs("_vflip", kwargs)
        flipped = self._vflip(**kwargs)
        flipped.recursive_apply_on_children(lambda c: _child_op(c, "_vflip", **ck))
        return flipped

    def resize(self, size: Tuple[int, int], **kwargs):
        """Resize to absolute (H, W); children receive the relative ratio
        (augmented_tensor.py:903-930)."""
        h, w = size
        size01 = (h / self.H, w / self.W)
        resized = self._resize(size01, **kwargs)
        resized.recursive_apply_on_children(lambda c: _child_op(c, "_resize", size01, **kwargs))
        return resized

    def rotate(self, angle: float, center=None, **kwargs):
        rotated = self._rotate(angle, center, **kwargs)
        rotated.recursive_apply_on_children(lambda c: _child_op(c, "_rotate", angle, center, **kwargs))
        return rotated

    def crop(self, H_crop: Tuple[float, float], W_crop: Tuple[float, float], **kwargs):
        """Relative crop in [0, 1] on both axes (augmented_tensor.py:973)."""
        if H_crop[0] < 0.0 or H_crop[1] > 1.0:
            raise ValueError(f"H_crop must be within [0, 1], got {H_crop}")
        if W_crop[0] < 0.0 or W_crop[1] > 1.0:
            raise ValueError(f"W_crop must be within [0, 1], got {W_crop}")
        ck = self._children_op_kwargs("_crop", kwargs)
        cropped = self._crop(H_crop, W_crop, **kwargs)
        cropped.recursive_apply_on_children(lambda c: _child_op(c, "_crop", H_crop, W_crop, **ck))
        return cropped

    def pad(self, offset_y=None, offset_x=None, multiple: Optional[int] = None, **kwargs):
        """Pad by relative offsets (top, bottom) / (left, right), or to the
        next multiple (augmented_tensor.py:1013-1060). Int offsets are
        converted to relative."""
        if multiple is not None:
            assert offset_x is None and offset_y is None
            def _mult_off(dim):
                if dim % multiple == 0:
                    return (0.0, 0.0)
                rem = multiple - dim % multiple
                return (int(np.floor(rem / 2)) / dim, int(np.ceil(rem / 2)) / dim)
            offset_y = _mult_off(self.H)
            offset_x = _mult_off(self.W)
        else:
            assert offset_x is not None and offset_y is not None
            if isinstance(offset_y[0], (int, np.integer)) and isinstance(offset_y[1], (int, np.integer)):
                offset_y = (offset_y[0] / self.H, offset_y[1] / self.H)
            if isinstance(offset_x[0], (int, np.integer)) and isinstance(offset_x[1], (int, np.integer)):
                offset_x = (offset_x[0] / self.W, offset_x[1] / self.W)
        ck = self._children_op_kwargs("_pad", kwargs)
        padded = self._pad(offset_y, offset_x, **kwargs)
        padded.recursive_apply_on_children(
            lambda c: _child_op(c, "_pad", offset_y, offset_x, **ck))
        return padded

    def spatial_shift(self, shift_y: float, shift_x: float, **kwargs):
        shifted = self._spatial_shift(shift_y, shift_x, **kwargs)
        shifted.recursive_apply_on_children(
            lambda c: _child_op(c, "_spatial_shift", shift_y, shift_x, **kwargs))
        return shifted

    # default per-type implementations raise; subclasses override
    def _hflip(self, **kwargs): raise NotImplementedError(type(self).__name__)
    def _vflip(self, **kwargs): raise NotImplementedError(type(self).__name__)
    def _resize(self, size01, **kwargs): raise NotImplementedError(type(self).__name__)
    def _rotate(self, angle, center=None, **kwargs): raise NotImplementedError(type(self).__name__)
    def _crop(self, H_crop, W_crop, **kwargs): raise NotImplementedError(type(self).__name__)
    def _pad(self, offset_y, offset_x, **kwargs): raise NotImplementedError(type(self).__name__)
    def _spatial_shift(self, sy, sx, **kwargs): raise NotImplementedError(type(self).__name__)


def _child_op(child: AugmentedArray, op: str, *args, **kwargs):
    """Apply a geometric sub-op on a child, tolerating children that don't
    implement it (mirrors the try/except contract, augmented_tensor.py:854)."""
    fn = getattr(child, op, None)
    if fn is None:
        return child
    try:
        return fn(*args, **kwargs)
    except NotImplementedError:
        return child
