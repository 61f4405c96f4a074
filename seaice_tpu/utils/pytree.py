"""Small pytree-dataclass helper (all fields are leaves)."""

import dataclasses

from jax.tree_util import register_pytree_node


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    names = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in names), None

    def unflatten(_, children):
        return cls(*children)

    register_pytree_node(cls, flatten, unflatten)
    return cls


def replace(obj, **kwargs):
    return dataclasses.replace(obj, **kwargs)
