"""Primitive-type registry (cf. `SPFN/fitter_factory.py`).

The type id of a primitive is its index in the registered list; configs
register ['sphere', 'plane', 'cylinder', 'cone'] (config_globalSPFN.yml), so
id 0 = sphere under the shipped configs. Note the reference's JSON export
(`metric_implementation.py:589-600`) hard-codes the order
['plane','sphere','cylinder','cone'] regardless — an internal inconsistency
we surface here via `get_registered_primitives()` so callers can pick.
"""

from __future__ import annotations

from cpfn_tpu.fitting import cone, cylinder, plane, sphere

DEFAULT_PRIMITIVES = ("plane", "sphere", "cylinder", "cone")

_primitive_name_to_id: dict[str, int] = {}

_MODULES = {
    "plane": plane,
    "sphere": sphere,
    "cylinder": cylinder,
    "cone": cone,
}


def register_primitives(primitive_name_list) -> None:
    """Reset the registry; must be called before building datasets/losses."""
    global _primitive_name_to_id
    _primitive_name_to_id = {
        name: idx for idx, name in enumerate(primitive_name_list)
    }


def primitive_name_to_id(name: str) -> int:
    return _primitive_name_to_id[name]


def get_n_registered_primitives() -> int:
    return len(_primitive_name_to_id)


def get_registered_primitives() -> list[str]:
    return sorted(_primitive_name_to_id, key=_primitive_name_to_id.get)


def get_module(name: str):
    return _MODULES[name]


def create_primitive_from_dict(d: dict):
    mod = _MODULES.get(d["type"])
    if mod is None:
        raise NotImplementedError(f"unknown primitive type {d['type']!r}")
    return mod.create_primitive_from_dict(d)
