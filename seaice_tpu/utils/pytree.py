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


def static_aux_pytree_dataclass(*static_names):
    """pytree_dataclass variant where the named fields travel as
    aux_data (static, hashable) instead of leaves — for plan metadata
    that jit must specialize on rather than trace."""
    def wrap(cls):
        cls = dataclasses.dataclass(frozen=True)(cls)
        names = [f.name for f in dataclasses.fields(cls)]
        leaf_names = [n for n in names if n not in static_names]

        def flatten(obj):
            return (tuple(getattr(obj, n) for n in leaf_names),
                    tuple(getattr(obj, n) for n in static_names))

        def unflatten(aux, children):
            kw = dict(zip(leaf_names, children))
            kw.update(dict(zip(static_names, aux)))
            return cls(**kw)

        register_pytree_node(cls, flatten, unflatten)
        return cls
    return wrap
