"""Generative-model front-end: a :class:`~..dists.combinators.ConditionalProduct`
plus observed data becomes an :class:`InferenceProblem`.

Equivalent of ``laplacePosteriorFit``'s model handling
(LaplaceApproximation.wl:453-518): the reference accepts a list of
``Distributed[var, dist]`` specs, builds the model graph, validates
acyclicity and dependency direction (LA:485-504), and splits the joint
density into a data log-likelihood and a parameter log-prior (LA:511-518).
Here the model is a ``ConditionalProduct`` (ancestral DAG,
BayesianUtilities.wl:496-629); observed variables are named in ``data``,
independent variables (regression inputs) in ``inputs``, and every other
node is a free parameter packed into the flat theta vector.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..dists.combinators import ConditionalProduct
from ..utils.graph import model_graph
from .problem import InferenceProblem

__all__ = ["generative_model_problem"]


def _parse_specs(parameters: Sequence):
    """Each spec: name | (name, lo, hi) | (name, lo, hi, shape)."""
    names, lows, highs, shapes = [], [], [], []
    for p in parameters:
        if isinstance(p, str):
            name, lo, hi, shape = p, -jnp.inf, jnp.inf, ()
        elif len(p) == 3:
            (name, lo, hi), shape = p, ()
        elif len(p) == 4:
            name, lo, hi, shape = p
            shape = tuple(int(s) for s in jnp.atleast_1d(jnp.asarray(shape)))
        else:
            raise ValueError(f"bad parameter spec: {p!r}")
        names.append(str(name))
        lows.append(float(lo))
        highs.append(float(hi))
        shapes.append(shape)
    if len(set(names)) != len(names):
        raise ValueError("duplicate parameter names")
    return names, lows, highs, shapes


def generative_model_problem(
    model: ConditionalProduct,
    data: dict,
    parameters: Sequence,
    inputs: Optional[dict] = None,
    constraint=None,
    **problem_metadata,
) -> InferenceProblem:
    """Condition a generative model on observed data.

    * ``model`` — a :class:`ConditionalProduct` over named variables.
    * ``data`` — observed variables: name -> array.  Each observed node's
      conditional density, summed over the observation axis, contributes
      to the log-likelihood (LA:511-515).
    * ``parameters`` — specs for the FREE variables: ``name`` or
      ``(name, lo, hi)`` (scalar) or ``(name, lo, hi, shape)`` (array
      parameter); they pack in order into the flat theta vector.  Their
      node densities form the log-prior.
    * ``inputs`` — independent (conditioning-only) variables, e.g.
      regression features; they take part in builders but carry no
      density (the red input vertices of ``modelGraph``, BU:744-750).

    Runs the reference's structural validation (LA:485-504): the traced
    dependency graph must be acyclic, inputs must have no parents, and
    parameters must not depend on observed variables.
    """
    inputs = dict(inputs or {})
    data = dict(data)
    names, lows, highs, shapes = _parse_specs(parameters)

    node_names = set(model.names)
    for k in data:
        if k not in node_names:
            raise ValueError(f"observed variable {k!r} is not a model node")
    for k in names:
        if k not in node_names:
            raise ValueError(f"parameter {k!r} is not a model node")
    unaccounted = node_names - set(data) - set(names) - set(inputs)
    if unaccounted:
        raise ValueError(
            f"model variables {sorted(unaccounted)} are neither observed, "
            "parameters, nor inputs (marginalizing latents is not supported "
            "here; reference behavior LA:466-477 treats them as parameters)"
        )
    overlap = set(data) & set(names)
    if overlap:
        raise ValueError(f"{sorted(overlap)} marked both observed and free")

    # structural validation (modelGraph + checks of LA:485-504)
    graph = model_graph(
        model.graph(),
        inputs=tuple(inputs),
        outputs=tuple(data),
        extra_vertices=tuple(model.names),
    )
    graph.validate_dependencies()

    # theta packing: [total_dim] flat vector in spec order
    sizes = [int(jnp.prod(jnp.asarray(s))) if s else 1 for s in shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)
    dim = offsets[-1]
    lower = jnp.concatenate(
        [jnp.full((s,), lo) for s, lo in zip(sizes, lows)]
    )
    upper = jnp.concatenate(
        [jnp.full((s,), hi) for s, hi in zip(sizes, highs)]
    )
    flat_names = []
    for nm, shape, s in zip(names, shapes, sizes):
        if not shape:
            flat_names.append(nm)
        else:
            flat_names.extend(f"{nm}[{i}]" for i in range(s))

    def unpack(theta):
        theta = jnp.asarray(theta)
        out = {}
        for nm, shape, o, s in zip(names, shapes, offsets, sizes):
            block = theta[..., o : o + s]
            out[nm] = block[..., 0] if not shape else block.reshape(
                theta.shape[:-1] + shape
            )
        return out

    def log_likelihood(theta):
        params = unpack(theta)
        known = dict(inputs)
        total = jnp.zeros((), jnp.result_type(jnp.asarray(theta).dtype, float))
        for name, builder in model.nodes:
            if name in inputs:
                # conditioning-only: value given, density ignored
                continue
            if name in data:
                dist = builder(known) if callable(builder) else builder
                total = total + jnp.sum(dist.log_prob(data[name]))
                known[name] = data[name]
            else:
                # parameter node: its density belongs to the prior; the
                # builder need not run here at all
                known[name] = params[name]
        return total

    def log_prior(theta):
        params = unpack(theta)
        known = dict(inputs)
        total = jnp.zeros((), jnp.result_type(jnp.asarray(theta).dtype, float))
        for name, builder in model.nodes:
            if name in inputs:
                continue
            if name in data:
                known[name] = data[name]
                continue
            dist = builder(known) if callable(builder) else builder
            total = total + jnp.sum(dist.log_prob(params[name]))
            known[name] = params[name]
        return total

    return InferenceProblem(
        lower=lower,
        upper=upper,
        log_likelihood=log_likelihood,
        log_prior=log_prior,
        param_names=tuple(flat_names),
        constraint=constraint,
        metadata=dict(
            generative_model=model, model_graph=graph, **problem_metadata
        ),
    )
