"""Python ``@model`` DSL — the GraphPPL-equivalent frontend (SURVEY.md §2.2).

Reference surface being reimplemented (docs/src/manuals/model-specification.md):
  * ``x ~ Normal(mean=..., var=...)``  →  ``x = Normal(mean=..., var=...)``
  * ``x[t] ~ MvNormal(...)``           →  ``x[t] = MvNormal(...)`` on a ``latent(T)``
  * data conditioning                  →  data args of the model function
  * broadcast ``.~`` / indexed loops   →  ``for t in plate(T):`` (symbolic plate)
  * keyword-parametrization aliases (src/model/graphppl.jl:340-423) → canonical
    fform resolution in the node functions below
  * anonymous nodes & constant folding of deterministic linear maps
    (docs/src/manuals/model-specification.md:217-245) → LinearExpr folding into
    'LinearGaussian' factors.

The model function is traced ONCE per data-shape signature; inside a plate the body
runs a single time with a symbolic index, producing plated (templated) factors that
the compiler lowers to scans — never a Python loop in the compiled program.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import numpy as np

from .ir import Const, Factor, ModelGraph, Plate, Ref, SymIndex, Variable

_STATE = threading.local()


def _builder() -> "ModelBuilder":
    b = getattr(_STATE, "builder", None)
    if b is None:
        raise RuntimeError(
            "Node constructors can only be used inside an @model function trace."
        )
    return b


def _active() -> Optional["ModelBuilder"]:
    return getattr(_STATE, "builder", None)


def _current_plate() -> Optional[Plate]:
    b = _builder()
    return b.plate_stack[-1] if b.plate_stack else None


# ---------------------------------------------------------------------------------
# Symbolic expressions over random variables
# ---------------------------------------------------------------------------------

class RVRef:
    """A reference to a random-variable slot, with operator overloads building
    linear expressions (folded into linear-Gaussian factors at canonicalization)."""

    __array_ufunc__ = None  # make numpy defer binary ops to us

    def __init__(self, ref: Ref):
        self.ref = ref

    # numpy matmul: A @ x
    def __rmatmul__(self, a):
        return LinearExpr(np.asarray(a), self, None)

    def __mul__(self, c):
        c = np.asarray(c)
        if c.ndim > 2:
            raise TypeError("rv multipliers must be scalar, vector, or matrix.")
        # vector/matrix * scalar-rv: a column map into a vector space
        return LinearExpr(c, self, None)

    __rmul__ = __mul__

    def __add__(self, b):
        if isinstance(b, (RVRef, LinearExpr)):
            return AddExpr((self, b))
        return LinearExpr(None, self, np.asarray(b))

    __radd__ = __add__

    def __sub__(self, b):
        return LinearExpr(None, self, -np.asarray(b))

    def __neg__(self):
        return LinearExpr(np.asarray(-1.0), self, None)

    def __repr__(self):
        return f"RVRef({self.ref})"


class LinearExpr:
    """a @ x + b (or scalar a * x + b)."""

    __array_ufunc__ = None

    def __init__(self, a, x: RVRef, b):
        self.a = a
        self.x = x
        self.b = b

    def __add__(self, b2):
        if isinstance(b2, (RVRef, LinearExpr)):
            # mixed combination of random terms: A @ x + B @ u (+ ...)
            return AddExpr((self, b2))
        b2 = np.asarray(b2)
        b = b2 if self.b is None else self.b + b2
        return LinearExpr(self.a, self.x, b)

    __radd__ = __add__

    def __rmatmul__(self, a2):
        a2 = np.asarray(a2)
        if self.b is not None:
            b = a2 @ self.b if np.ndim(self.b) else a2 * self.b
        else:
            b = None
        a = a2 if self.a is None else (a2 @ self.a if np.ndim(self.a) >= 2 else a2 * self.a)
        return LinearExpr(a, self.x, b)

    def __mul__(self, c):
        c = np.asarray(c)
        a = c if self.a is None else c * self.a
        b = None if self.b is None else c * self.b
        return LinearExpr(a, self.x, b)

    __rmul__ = __mul__


class AddExpr:
    """Sum of random terms — plain rvs (lowered to a 'Sum' deterministic node)
    or linear-map terms ``A @ x`` (lowered to a 'LinComb' node)."""

    __array_ufunc__ = None

    def __init__(self, terms):
        self.terms = tuple(terms)

    def __add__(self, other):
        if isinstance(other, (RVRef, LinearExpr)):
            return AddExpr(self.terms + (other,))
        raise TypeError("rv-sum expressions support rv / A @ rv terms only.")

    __radd__ = __add__

    @property
    def has_linear_terms(self):
        return any(isinstance(t, LinearExpr) for t in self.terms)


def dot(a, x: RVRef) -> LinearExpr:
    """Inner product of a known vector with a random vector (reference ``dot``).

    ``a`` may be a constant vector or an (indexed) data array — e.g. regression
    features: ``y[i] = Normal(mean=dot(phi[i], theta), var=1.0)``."""
    if isinstance(a, RVRef):
        if a.ref.var.kind != "data":
            raise TypeError(
                "dot() with two random arguments needs the SoftDot node "
                "(reference SoftDot); pass features as data or constants."
            )
        return LinearExpr(a.ref, x, None)
    a = np.asarray(a)
    if a.ndim != 1:
        raise TypeError("dot() expects a vector first argument.")
    return LinearExpr(a, x, None)


# ---------------------------------------------------------------------------------
# Variable containers exposed to the model body
# ---------------------------------------------------------------------------------

class LatentArray:
    """Array of latent random variables; ``x[t] = Node(...)`` defines slot t."""

    def __init__(self, var: Variable):
        self._var = var

    def __len__(self):
        return self._var.length

    def _norm_idx(self, key):
        if isinstance(key, SymIndex):
            return key
        key = int(key)
        if key < 0:
            key += self._var.length
        return key

    def __getitem__(self, key) -> RVRef:
        return RVRef(Ref(self._var, self._norm_idx(key)))

    def __setitem__(self, key, value):
        if not isinstance(value, RVRef):
            raise TypeError(
                f"x[t] = ... expects a node constructor call (got {type(value)})."
            )
        _builder().rebind(value.ref, Ref(self._var, self._norm_idx(key)))


def _check_grid_key(key: tuple, axes: tuple, name: str) -> tuple:
    """Validate a grid index ``[i, j]``: zero-offset symbolic indices over full
    plates, in outer→inner order matching the array's leading axes."""
    if not all(isinstance(k, SymIndex) for k in key):
        raise TypeError(
            "multi-axis grid indexing supports symbolic plate indices only "
            "(mixed concrete/symbolic grid slots are not supported)."
        )
    if len(axes) < len(key):
        raise ValueError(
            f"{name} has {len(axes)} grid axes, indexed with {len(key)}."
        )
    stack = _builder().plate_stack
    plates = tuple(k.plate for k in key)
    if tuple(stack[-len(key):]) != plates:
        raise ValueError(
            "grid index plate order must match the nesting order of the "
            "active plates (outer first); transpose the array if its axes "
            "are ordered differently."
        )
    for ax, k in enumerate(key):
        if k.offset != 0 or k.plate.lo != 0 or k.plate.hi != axes[ax]:
            raise NotImplementedError(
                "grid slots need zero-offset indices over full plates "
                f"(axis {ax}: plate [{k.plate.lo},{k.plate.hi}) vs axis "
                f"length {axes[ax]}); lagged grid references are not "
                "supported."
            )
    return key


class GridLatentArray:
    """Multi-axis latent array: ``z[i, j] = Node(...)`` inside nested plates
    defines the whole grid at once (reference: multi-dimensional randomvar
    arrays, GraphPPL x[i, j] indexing)."""

    def __init__(self, var: Variable, axes: tuple):
        self._var = var
        self.axes = axes

    def __getitem__(self, key) -> RVRef:
        if not isinstance(key, tuple):
            raise TypeError(
                f"grid latent {self._var.name} must be indexed with "
                f"{len(self.axes)} indices."
            )
        return RVRef(Ref(self._var, _check_grid_key(key, self.axes, self._var.name)))

    def __setitem__(self, key, value):
        if not isinstance(value, RVRef):
            raise TypeError("z[i, j] = ... expects a node constructor call.")
        _builder().rebind(
            value.ref,
            Ref(self._var, _check_grid_key(key, self.axes, self._var.name)),
        )


class DataArray:
    """Observed-data placeholder; ``y[t] = Node(...)`` observes slot t.

    Data arrays know their shape/dtype at trace time but not their values (values
    are runtime arguments of the compiled program — the equivalent of
    ``new_observation!`` becoming buffer donation, SURVEY.md §3.1).

    Whether the leading axis is a plate or part of the event is decided by USAGE:
    indexing (``y[t]``) marks it a plate; passing the array whole (``mean=pm`` or
    ``y.observe(...)``) marks the full shape as one event (needed for streaming
    single-step models where priors arrive as data)."""

    def __init__(self, var: Variable, shape: tuple, dtype):
        self._var = var
        self.shape = shape
        self.dtype = dtype
        # undecided until first use; default whole-event
        var.length = None
        var.event_shape = shape
        var.dtype = dtype

    def __len__(self):
        return self.shape[0]

    @property
    def plate_size(self):
        return self.shape[0]

    def _mark_indexed(self):
        if self._var.length is None:
            self._var.length = self.shape[0]
            self._var.event_shape = self.shape[1:]

    def _norm_grid_idx(self, key: tuple) -> tuple:
        """Nested-plate grid index ``y[i, j]`` (factor replication over products
        of axes; reference: nested loop indices in @model bodies)."""
        key = _check_grid_key(key, self.shape, self._var.name)
        if self._var.length is not None:
            raise ValueError(
                f"data array {self._var.name} is used with both single and "
                "grid indexing."
            )
        self._var.grid_axes = tuple(self.shape[: len(key)])
        self._var.event_shape = self.shape[len(key):]
        return key

    def _norm_idx(self, key):
        if isinstance(key, tuple):
            return self._norm_grid_idx(key)
        self._mark_indexed()
        if isinstance(key, SymIndex):
            return key
        key = int(key)
        if key < 0:
            key += self._var.length
        return key

    def __getitem__(self, key) -> RVRef:
        # Data used as an *input* (covariates): behaves like an observed ref.
        return RVRef(Ref(self._var, self._norm_idx(key)))

    def __setitem__(self, key, value):
        if not isinstance(value, RVRef):
            raise TypeError("y[t] = ... expects a node constructor call.")
        _builder().rebind(value.ref, Ref(self._var, self._norm_idx(key)))

    def observe(self, value: RVRef):
        """Observe the whole (scalar) data variable: ``y.observe(Normal(...))``."""
        _builder().rebind(value.ref, Ref(self._var, None))

    # -- folded arithmetic (reference: "Data variables should fold
    # automatically", test/models/models_tests.jl:221+) ----------------------
    def __add__(self, o):
        return DataExpr._lift(self)._bin(o, "add")

    __radd__ = __add__

    def __sub__(self, o):
        return DataExpr._lift(self)._bin(o, "sub")

    def __rsub__(self, o):
        return DataExpr._lift(o)._bin(self, "sub")

    def __mul__(self, o):
        return DataExpr._lift(self)._bin(o, "mul")

    __rmul__ = __mul__

    def __truediv__(self, o):
        return DataExpr._lift(self)._bin(o, "div")

    def __rtruediv__(self, o):
        return DataExpr._lift(o)._bin(self, "div")

    def __neg__(self):
        return DataExpr._lift(self)._bin(-1.0, "mul")


class DataExpr:
    """Lazy elementwise arithmetic over data variables.

    The reference folds data-variable expressions (``x ~ Normal(mean=a + b +
    1 - 1, ...)`` with data-valued a, b) into anonymous folded data interfaces
    (test/models/models_tests.jl:221+, GraphPPL constant/data folding).  Here
    the expression is recorded at trace time and materialized as a DERIVED
    data variable: ``graph.derived_data[name]`` maps to a jnp-traceable
    function of the runtime data dict, evaluated inside the compiled program
    (engine/compile.py ``_with_derived``)."""

    __array_ufunc__ = None

    _OPS = {
        "add": lambda x, y: x + y,
        "sub": lambda x, y: x - y,
        "mul": lambda x, y: x * y,
        "div": lambda x, y: x / y,
    }

    def __init__(self, fn, srcs, shape):
        self.fn = fn        # (data dict) -> array
        self.srcs = srcs    # names of source data variables
        self.shape = shape

    @staticmethod
    def _lift(v) -> "DataExpr":
        if isinstance(v, DataExpr):
            return v
        if isinstance(v, DataArray):
            name = v._var.name
            return DataExpr(lambda data, n=name: data[n], {name}, v.shape)
        arr = np.asarray(v)
        if arr.dtype == object:
            raise TypeError(
                f"`{type(v).__name__}` cannot appear in a data-variable "
                "expression inside @model."
            )
        return DataExpr(lambda data, a=arr: a, set(), arr.shape)

    def _bin(self, other, opname) -> "DataExpr":
        o = DataExpr._lift(other)
        op = DataExpr._OPS[opname]
        shape = np.broadcast_shapes(self.shape, o.shape)
        f1, f2 = self.fn, o.fn
        return DataExpr(
            lambda data: op(f1(data), f2(data)), self.srcs | o.srcs, shape
        )

    __add__ = lambda self, o: self._bin(o, "add")
    __radd__ = __add__
    __sub__ = lambda self, o: self._bin(o, "sub")
    __rsub__ = lambda self, o: DataExpr._lift(o)._bin(self, "sub")
    __mul__ = lambda self, o: self._bin(o, "mul")
    __rmul__ = __mul__
    __truediv__ = lambda self, o: self._bin(o, "div")
    __rtruediv__ = lambda self, o: DataExpr._lift(o)._bin(self, "div")
    __neg__ = lambda self: self._bin(-1.0, "mul")


def latent(length, name: Optional[str] = None):
    """Declare an array of latent variables (reference: implicit ``x[i] ~ ...``).

    ``length`` may be a tuple for a multi-axis latent grid (``latent((N, M))``,
    defined inside nested plates with ``z[i, j] = Node(...)``)."""
    b = _builder()
    if isinstance(length, tuple):
        axes = tuple(int(a) for a in length)
        var = b.graph.add_variable(
            Variable(b.scoped_name(name) if name else b.fresh_name("x"),
                     "random", None)
        )
        var.grid_axes = axes
        var.scope = tuple(b.scope_stack)
        return GridLatentArray(var, axes)
    var = b.graph.add_variable(
        Variable(b.scoped_name(name) if name else b.fresh_name("x"),
                 "random", int(length))
    )
    var.scope = tuple(b.scope_stack)
    return LatentArray(var)


def scope(name: str):
    """Submodel scope context: ``with rx.scope("walk"): ...`` prefixes the names
    of variables created inside with ``walk/`` and records the scope path on the
    IR, making submodel instances addressable — posteriors appear as
    ``result.posteriors["walk/x"]`` and constraints can target the block with
    ``constraints(submodel={"walk": ...})``.

    Reference: GraphPPL nested submodel contexts + submodel-scoped @constraints
    blocks (``for q in submodel``, specific-instance ``(submodel, i)``;
    docs/src/manuals/variational/constraints-specification.md:210-292).  Since
    submodels here are plain Python functions inlined into the trace, the scope
    is what gives their contents an identity.  Repeated uses of one name become
    instances ``walk``, ``walk:2``, ... — a constraint keyed ``"walk"`` applies
    to every instance, ``"walk:2"`` to that instance only."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        b = _builder()
        b.enter_scope(name)
        try:
            yield
        finally:
            b.scope_stack.pop()

    return _cm()


def submodel(fn=None, *, name: Optional[str] = None, default_constraints=None,
             default_init=None):
    """Declare a Python function as a named submodel.

    Every call auto-enters a scope named after the function (instances get
    ``name``, ``name:2``, ... suffixes exactly like ``rx.scope``), and
    ``default_constraints`` attach to *every* instance of the submodel type
    unless the user's ``constraints(submodel={...})`` targets that instance —
    the reference's ``GraphPPL.default_constraints(::typeof(inner)) =
    @constraints ...`` mechanism
    (docs/src/manuals/variational/constraints-specification.md:240-256).

    ::

        @rx.submodel(default_constraints=rx.constraints(
            forms={"tau": rx.PointMassFormConstraint()}))
        def gauss_block(y):
            ...
    """
    import functools

    def deco(f):
        sm_name = name or f.__name__

        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            b = _builder()
            # Node contraction (reference: infer(allow_node_contraction=true),
            # test/inference/inference_tests.jl:526-686 + docs
            # model-specification.md:332-447): a submodel whose NAME has a
            # registered node type is emitted as ONE factor instead of tracing
            # its body — the user's registered rules drive it directly.
            if getattr(b, "allow_node_contraction", False):
                from ..rules.registry import has_node

                if has_node(sm_name):
                    if args:
                        raise TypeError(
                            f"node contraction of submodel {sm_name!r} "
                            "requires keyword arguments (they name the "
                            "factor's interfaces)."
                        )
                    return b.emit(
                        sm_name,
                        {k: _as_interface(v) for k, v in kwargs.items()},
                    )
            b.enter_scope(sm_name)
            if default_constraints is not None:
                d = getattr(b.graph, "default_submodel_constraints", None)
                if d is None:
                    d = {}
                    b.graph.default_submodel_constraints = d
                d[sm_name] = default_constraints
            if default_init is not None:
                # reference GraphPPL.default_init(::typeof(submodel)) —
                # initialization every instance gets unless the user's
                # initialization= targets it (initialization_plugin_tests.jl
                # :1161-1186); consumed in CompiledModel.__init__.
                di = getattr(b.graph, "default_submodel_init", None)
                if di is None:
                    di = {}
                    b.graph.default_submodel_init = di
                di[sm_name] = dict(default_init)
            try:
                return f(*args, **kwargs)
            finally:
                b.scope_stack.pop()

        wrapped.__rx_submodel__ = sm_name
        return wrapped

    return deco(fn) if fn is not None else deco


def plate(*args, name: Optional[str] = None):
    """Symbolic plate iterator: ``for t in plate(T)`` or ``plate(lo, hi)``.

    The body executes ONCE with a symbolic index; every node created inside becomes
    a plated (templated) factor lowered to batched ops / scans."""
    if len(args) == 1:
        lo, hi = 0, int(args[0])
    else:
        lo, hi = int(args[0]), int(args[1])
    b = _builder()
    p = Plate(lo, hi, name)
    b.graph.add_plate(p)
    b.plate_stack.append(p)
    try:
        yield SymIndex(p, 0)
    finally:
        b.plate_stack.pop()


# ---------------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------------

class RequireMessage:
    """Per-node functional-dependencies override: computing the outbound
    message from a named interface additionally receives the *inbound message*
    on that same edge (the reference's ``m_`` argument) instead of nothing,
    seeded with an optional initial message on the first sweep.

    Reference: ``where { dependencies = RequireMessageFunctionalDependencies(
    in = NormalMeanPrecision(0.0, 1.0)) }``
    (docs/src/manuals/model-specification.md:471-480).  Python can't use the
    ``in`` keyword, so a trailing underscore is stripped: ``in_=...``."""

    def __init__(self, **interfaces):
        self.interfaces = {
            (k[:-1] if k.endswith("_") else k): v for k, v in interfaces.items()
        }

    def __repr__(self):
        return f"RequireMessage({', '.join(self.interfaces)})"


# reference-spelled alias
RequireMessageFunctionalDependencies = RequireMessage


class where:
    """Block-scoped node-creation options, the reference's ``where {...}``
    (docs/src/manuals/model-specification.md:449-480)::

        with rx.where(dependencies=rx.RequireMessage(in_=prior)):
            y[k] = rx.Probit(x[k])

    ``meta`` merges into (without overriding) any node-specific meta dict;
    ``dependencies`` attaches a RequireMessage spec to every factor emitted
    inside the block."""

    def __init__(self, meta=None, dependencies=None):
        self.meta = meta
        self.dependencies = dependencies

    def __enter__(self):
        b = _active()
        if b is None:
            raise RuntimeError("rx.where(...) is only valid inside @rx.model.")
        b.options_stack.append(self)
        return self

    def __exit__(self, *exc):
        _builder().options_stack.pop()
        return False


class ModelBuilder:
    def __init__(self, name: str):
        self.graph = ModelGraph(name)
        self.plate_stack: list[Plate] = []
        self.options_stack: list["where"] = []
        self.scope_stack: list[str] = []
        self._scope_counts: dict[str, int] = {}
        self._name_counter = 0
        # (file, line, name) -> Variable that currently holds that source-line
        # name hint; later emits from the same statement steal it back.
        self._line_hints: dict = {}
        self._pending_hint_key = None

    def fresh_name(self, prefix: str) -> str:
        self._name_counter += 1
        return f"_{prefix}{self._name_counter}"

    def scoped_name(self, name: str) -> str:
        """Prefix a user-facing name with the active scope path ('walk/x')."""
        if not self.scope_stack or name.startswith("_"):
            return name
        return "/".join(self.scope_stack) + "/" + name

    def enter_scope(self, name: str) -> str:
        """Open a submodel scope instance; repeated uses of the same name get
        instance suffixes 'name', 'name:2', 'name:3' (reference: GraphPPL
        submodel contexts, addressable per-instance in @constraints)."""
        if "/" in name or ":" in name:
            raise ValueError("scope names may not contain '/' or ':'")
        n = self._scope_counts.get(name, 0) + 1
        self._scope_counts[name] = n
        seg = name if n == 1 else f"{name}:{n}"
        self.scope_stack.append(seg)
        return seg

    # -- node creation -----------------------------------------------------------
    def _guess_target_name(self) -> Optional[str]:
        """Best-effort capture of the assignment target (``theta = Beta(...)``) so
        scalar latents get user-facing names, mirroring the reference's
        ``theta ~ Beta(...)`` macro capture.  Heuristic: parse the calling source
        line; falls back to anonymous on any mismatch."""
        import linecache
        import re
        import sys

        frame = sys._getframe(2)
        # walk out of dsl-internal frames
        while frame is not None and frame.f_code.co_filename == __file__:
            frame = frame.f_back
        if frame is None:
            return None
        line = linecache.getline(frame.f_code.co_filename, frame.f_lineno)
        m = re.match(r"\s*([A-Za-z_]\w*)\s*=[^=]", line)
        if not m:
            return None
        name = self.scoped_name(m.group(1))
        # Nested calls emit inner factors first (``x = IMPLY(a, NOT(b))``
        # emits NOT before IMPLY), and loops re-emit from the same line; in
        # both cases the assignment target is the LAST emit of the statement.
        # Steal the name back from an earlier emit of this same source line.
        key = (frame.f_code.co_filename, frame.f_lineno, name)
        prev = self._line_hints.get(key)
        if prev is not None and prev.name == name:
            prev.name = self.fresh_name("v")
        elif any(v.name == name for v in self.graph.variables):
            return None
        self._pending_hint_key = key
        return name

    def emit(self, fform: str, interfaces: dict, meta=None) -> RVRef:
        """Create a factor with a fresh anonymous output variable; return its ref."""
        p = self.plate_stack[-1] if self.plate_stack else None
        guessed = None if p is not None else self._guess_target_name()
        if p is not None:
            var = self.graph.add_variable(
                Variable(self.fresh_name("v"), "random", p.size)
            )
            # Anonymous plated arrays are indexed [0, size) while the plate runs
            # [lo, hi): slot (t - lo) of the anonymous array belongs to step t.
            out = Ref(var, SymIndex(p, -p.lo))
        else:
            var = self.graph.add_variable(
                Variable(guessed or self.fresh_name("v"), "random")
            )
            if guessed is not None:
                self._line_hints[self._pending_hint_key] = var
            out = Ref(var, None)
        var.scope = tuple(self.scope_stack)
        f = Factor(fform, out, interfaces, plate=p, meta=meta)
        f.plates = tuple(self.plate_stack)
        f.scope = tuple(self.scope_stack)
        for opt in self.options_stack:
            if opt.meta is not None:
                extra = opt.meta if isinstance(opt.meta, dict) else \
                    {"method": opt.meta}
                f.meta = {**extra, **(f.meta or {})}
            if opt.dependencies is not None:
                f.dependencies = opt.dependencies
        self.graph.add_factor(f)
        return RVRef(out)

    def rebind(self, anon_ref: Ref, target: Ref):
        """Rebind a just-created anonymous output to a named latent/data slot."""
        anon_var = anon_ref.var
        for f in self.graph.factors:
            if f.out.var is anon_var:
                f.out = target
            for k, v in list(f.interfaces.items()):
                if isinstance(v, Ref) and v.var is anon_var:
                    # preserve relative offset between use and definition
                    idx = target.idx
                    if isinstance(v.idx, SymIndex) and isinstance(idx, SymIndex):
                        delta = v.idx.offset - anon_ref.idx.offset
                        idx = SymIndex(idx.plate, idx.offset + delta)
                    f.interfaces[k] = Ref(target.var, idx)
        self.graph.variables.remove(anon_var)


def _as_interface(v) -> Any:
    """Normalize a node argument to Ref or Const."""
    from ..dists import Distribution, PointMass

    if isinstance(v, RVRef):
        return v.ref
    if isinstance(v, DataArray):
        # whole-array use: the full shape is one event (streaming priors etc.)
        return Ref(v._var, None)
    if isinstance(v, (LinearExpr, AddExpr)):
        return v
    if isinstance(v, DataExpr):
        # folded data expression -> anonymous derived data variable computed
        # from the runtime data dict inside the compiled program
        b = _builder()
        name = b.fresh_name("fold")
        var = b.graph.add_variable(Variable(name, "data", None))
        var.event_shape = tuple(v.shape)
        var.dtype = np.float32
        b.graph.derived_data[name] = v.fn
        return Ref(var, None)
    if isinstance(v, PointMass):
        return Const(np.asarray(v.point))
    if isinstance(v, Distribution):
        # A Distribution object used where a random variable is expected:
        # auto-lift into a prior factor, memoized per instance (reference:
        # `θ ~ prior` with a Distributions.jl object passed as a model
        # argument, test/models/models_tests.jl:45-109).
        return _lift_dist(v).ref
    arr = np.asarray(v)
    if arr.dtype == object:
        # reference: "`X` cannot be used as a factor node" user-friendly error
        # (test/models/models_tests.jl:203-218)
        raise TypeError(
            f"`{type(v).__name__}` cannot be used as a factor-node argument "
            "inside @model: it is neither a random variable, data, a numeric "
            "constant, nor a known distribution. Use the rxinfer_tpu node "
            "vocabulary (rx.Normal, rx.Beta, ...) or register a custom node "
            "(rx.factor_node + rules.registry.node)."
        )
    return Const(arr)


# ---------------------------------------------------------------------------------
# Node constructors (the user-facing vocabulary)
#
# Context-sensitive: inside an @model trace they create factor nodes; outside they
# construct plain distribution objects (so the same vocabulary serves priors,
# @initialization specs, and tests) — mirroring how the reference resolves
# ``Normal(mean=..., var=...)`` both as node and distribution via alias tables.
# ---------------------------------------------------------------------------------

# canonical fform -> direct distribution constructor (positional, canonical order)
def _direct_dist(fform: str, *args):
    from .. import dists as D

    table = {
        "NormalMeanVariance": D.NormalMeanVariance,
        "NormalMeanPrecision": D.NormalMeanPrecision,
        "MvNormalMeanCovariance": D.MvNormalMeanCovariance,
        "MvNormalMeanPrecision": D.MvNormalMeanPrecision,
        "MvNormalMeanScalePrecision": D.MvNormalMeanScalePrecision,
        "Beta": D.Beta,
        "Bernoulli": D.Bernoulli,
        "Binomial": D.Binomial,
        "GammaShapeRate": D.GammaShapeRate,
        "GammaShapeScale": D.GammaShapeScale,
        "InverseGamma": D.InverseGamma,
        "Categorical": D.Categorical.from_probs,
        "Dirichlet": D.Dirichlet,
        "DirichletCollection": D.DirichletCollection,
        "Wishart": D.Wishart,
        "InverseWishart": D.InverseWishart,
        "Poisson": D.Poisson,
        "Uniform": D.Uniform,
    }
    import jax.numpy as jnp

    return table[fform](*[jnp.asarray(a, dtype=jnp.float32) for a in args])


def _lift_dist(d) -> RVRef:
    """Emit a prior factor for a Distribution INSTANCE used inside a trace.

    Mirrors the reference's `θ ~ prior` where `prior` is a Distributions.jl
    object passed as a model argument (test/models/models_tests.jl:45-109):
    the object's parameters become compile-time constants of a prior factor.
    Memoized per instance so repeated uses share one random variable."""
    from .. import dists as D

    b = _builder()
    memo = b.__dict__.setdefault("_dist_lift_memo", {})
    hit = memo.get(id(d))
    if hit is not None:
        return hit[1]
    t = type(d)
    table = {
        D.NormalMeanVariance: lambda: Normal(mean=d.mu, var=d.v),
        D.NormalMeanPrecision: lambda: Normal(mean=d.mu, precision=d.w),
        D.MvNormalMeanCovariance: lambda: MvNormal(mean=d.mu, cov=d.sigma),
        D.MvNormalMeanPrecision: lambda: MvNormal(mean=d.mu, precision=d.w),
        D.MvNormalMeanScalePrecision: lambda: MvNormal(mean=d.mu, gamma=d.gamma),
        D.Beta: lambda: Beta(d.a, d.b),
        D.Bernoulli: lambda: Bernoulli(d.p),
        D.Binomial: lambda: Binomial(d.n, d.p),
        D.GammaShapeRate: lambda: Gamma(shape=d.a, rate=d.b),
        D.GammaShapeScale: lambda: Gamma(shape=d.a, scale=d.theta),
        D.InverseGamma: lambda: InverseGamma(d.a, d.b),
        D.Categorical: lambda: Categorical(d.probs()),
        D.Dirichlet: lambda: Dirichlet(d.alpha),
        D.DirichletCollection: lambda: DirichletCollection(d.alpha),
        D.Wishart: lambda: Wishart(d.nu, d.s),
        D.InverseWishart: lambda: InverseWishart(d.nu, d.psi),
        D.Poisson: lambda: Poisson(d.lam),
        D.Uniform: lambda: Uniform(d.lo, d.hi),
    }
    ctor = table.get(t)
    if ctor is None:
        raise TypeError(
            f"`{t.__name__}` cannot be used as a prior inside @model: no "
            "factor node matches this distribution family."
        )
    # A dist-object prior is one shared latent even when first USED inside a
    # plate loop (the reference's `θ ~ prior` sits above the loop); emit the
    # prior factor outside the active plate context.
    saved, b.plate_stack = b.plate_stack, []
    try:
        ref = ctor()
    finally:
        b.plate_stack = saved
    memo[id(d)] = (d, ref)  # keep d alive so id() stays unique per trace
    return ref


def _gaussian(kind_scalar: str, kwargs: dict) -> RVRef:
    """Canonicalize Normal/MvNormal keyword aliases (reference
    src/model/graphppl.jl:340-423) and fold linear means into LinearGaussian."""
    mean = kwargs.pop("mean", None)
    if mean is None and "m" in kwargs:
        mean = kwargs.pop("m")
    noise_kinds = [
        ("var", "Variance"),
        ("variance", "Variance"),
        ("v", "Variance"),
        ("cov", "Covariance"),
        ("covariance", "Covariance"),
        ("precision", "Precision"),
        ("prec", "Precision"),
        ("tau", "Precision"),
        ("w", "Precision"),
        ("gamma", "ScalePrecision"),
    ]
    noise_val, noise_kind = None, None
    for key, kind in noise_kinds:
        if key in kwargs:
            if noise_val is not None:
                raise TypeError("Specify exactly one of var/cov/precision.")
            noise_val, noise_kind = kwargs.pop(key), kind
    if kwargs:
        raise TypeError(f"Unknown Normal arguments: {list(kwargs)}")
    if mean is None or noise_val is None:
        raise TypeError("Normal requires mean and one of var/cov/precision.")

    mv = kind_scalar == "MvNormal"
    if mv:
        base = {"Variance": "MvNormalMeanCovariance",
                "Covariance": "MvNormalMeanCovariance",
                "Precision": "MvNormalMeanPrecision",
                "ScalePrecision": "MvNormalMeanScalePrecision"}[noise_kind]
    else:
        base = {"Variance": "NormalMeanVariance",
                "Covariance": "NormalMeanVariance",
                "Precision": "NormalMeanPrecision",
                "ScalePrecision": "NormalMeanPrecision"}[noise_kind]

    noise_name = {"MvNormalMeanCovariance": "cov",
                  "MvNormalMeanPrecision": "prec",
                  "MvNormalMeanScalePrecision": "gamma",
                  "NormalMeanVariance": "var",
                  "NormalMeanPrecision": "prec"}[base]

    if _active() is None:
        return _direct_dist(base, mean, noise_val)

    if isinstance(mean, AddExpr):
        # x ~ Normal(mean = a + b, ...) with random a, b: contract into a single
        # GaussianSum factor (exact BP messages + well-defined average energy;
        # reference anonymous-node contraction,
        # docs/src/manuals/model-specification.md:332-447).
        if mean.has_linear_terms:
            # mixed A @ x + B @ u combinations: explicit LinComb node
            mean = lincomb(mean)
        elif noise_name in ("var", "cov", "prec"):
            interfaces = {
                f"in{i}": _as_interface(t) for i, t in enumerate(mean.terms)
            }
            interfaces[noise_name] = _as_interface(noise_val)
            fform = ("Mv" if mv else "") + "GaussianSum" + (
                "Covariance" if noise_name in ("var", "cov") else "Precision"
            )
            return _builder().emit(fform, interfaces)
        else:
            # scale-precision parametrization: explicit Sum node fallback
            mean = Sum(*mean.terms)
    if isinstance(mean, LinearExpr):
        # Fold deterministic linear map into a LinearGaussian factor
        # (reference: node contraction of anonymous deterministic nodes,
        # docs/src/manuals/model-specification.md:332-447).
        a_val = mean.a
        # dot-product mean (scalar out, vector random in): dedicated node
        is_dot = (not mv) and (
            isinstance(a_val, Ref) or (a_val is not None and np.ndim(a_val) == 1)
        )
        a_ifc = (
            a_val if isinstance(a_val, Ref)
            else Const(np.asarray(a_val)) if a_val is not None
            else Const(np.asarray(1.0))
        )
        interfaces = {
            "in": mean.x.ref,
            "A": a_ifc,
            "b": Const(np.asarray(mean.b)) if mean.b is not None else Const(np.asarray(0.0)),
            noise_name: _as_interface(noise_val),
        }
        if is_dot:
            fform = "GaussianDot" + (
                "Covariance" if noise_name in ("var",) else "Precision"
            )
        else:
            fform = ("Mv" if mv else "") + "LinearGaussian" + (
                "Covariance" if noise_name in ("cov", "var") else "Precision"
            )
        return _builder().emit(fform, interfaces)

    return _builder().emit(base, {"mean": _as_interface(mean), noise_name: _as_interface(noise_val)})


def Normal(**kwargs) -> RVRef:
    return _gaussian("Normal", dict(kwargs))


def MvNormal(**kwargs) -> RVRef:
    return _gaussian("MvNormal", dict(kwargs))


def Beta(a, b) -> RVRef:
    if _active() is None:
        return _direct_dist("Beta", a, b)
    return _builder().emit("Beta", {"a": _as_interface(a), "b": _as_interface(b)})


def Bernoulli(p) -> RVRef:
    if _active() is None:
        return _direct_dist("Bernoulli", p)
    return _builder().emit("Bernoulli", {"p": _as_interface(p)})


def Binomial(n, p) -> RVRef:
    if _active() is None:
        return _direct_dist("Binomial", n, p)
    return _builder().emit("Binomial", {"n": _as_interface(n), "p": _as_interface(p)})


def Gamma(shape=None, rate=None, scale=None, a=None, b=None) -> RVRef:
    sh = shape if shape is not None else a
    if rate is None and b is not None:
        rate = b
    if sh is None or (rate is None and scale is None):
        raise TypeError("Gamma requires shape and rate (or scale).")
    if scale is not None:
        if _active() is None:
            return _direct_dist("GammaShapeScale", sh, scale)
        return _builder().emit(
            "GammaShapeScale", {"shape": _as_interface(sh), "scale": _as_interface(scale)}
        )
    if _active() is None:
        return _direct_dist("GammaShapeRate", sh, rate)
    return _builder().emit(
        "GammaShapeRate", {"shape": _as_interface(sh), "rate": _as_interface(rate)}
    )


def InverseGamma(shape, scale) -> RVRef:
    if _active() is None:
        return _direct_dist("InverseGamma", shape, scale)
    return _builder().emit(
        "InverseGamma", {"shape": _as_interface(shape), "scale": _as_interface(scale)}
    )


def Categorical(p) -> RVRef:
    if _active() is None:
        return _direct_dist("Categorical", p)
    return _builder().emit("Categorical", {"p": _as_interface(p)})


def Dirichlet(alpha) -> RVRef:
    if _active() is None:
        return _direct_dist("Dirichlet", alpha)
    return _builder().emit("Dirichlet", {"alpha": _as_interface(alpha)})


def DirichletCollection(alpha) -> RVRef:
    if _active() is None:
        return _direct_dist("DirichletCollection", alpha)
    return _builder().emit("DirichletCollection", {"alpha": _as_interface(alpha)})


def Wishart(nu, S) -> RVRef:
    if _active() is None:
        return _direct_dist("Wishart", nu, S)
    return _builder().emit("Wishart", {"nu": _as_interface(nu), "S": _as_interface(S)})


def InverseWishart(nu, Psi) -> RVRef:
    if _active() is None:
        return _direct_dist("InverseWishart", nu, Psi)
    return _builder().emit(
        "InverseWishart", {"nu": _as_interface(nu), "Psi": _as_interface(Psi)}
    )


def Multinomial(n, p) -> RVRef:
    if _active() is None:
        from .. import dists as D
        import jax.numpy as jnp
        return D.Multinomial(jnp.asarray(n, jnp.float32),
                             jnp.log(jnp.clip(jnp.asarray(p, jnp.float32), 1e-37)))
    return _builder().emit(
        "Multinomial", {"n": _as_interface(n), "p": _as_interface(p)}
    )


def BinomialPolya(x, n, beta) -> RVRef:
    """Binomial regression via Polya-Gamma augmentation (reference BinomialPolya)."""
    return _builder().emit(
        "BinomialPolya",
        {"x": _as_interface(x), "n": _as_interface(n), "beta": _as_interface(beta)},
    )


def MultinomialPolya(x, n, beta) -> RVRef:
    return _builder().emit(
        "MultinomialPolya",
        {"x": _as_interface(x), "n": _as_interface(n), "beta": _as_interface(beta)},
    )


def ContinuousTransition(x, theta, prec) -> RVRef:
    """out = reshape(theta) @ x + noise with random vectorized transition matrix
    (reference ContinuousTransition / CTransition)."""
    return _builder().emit(
        "ContinuousTransition",
        {"in": _as_interface(x), "theta": _as_interface(theta),
         "prec": _as_interface(prec)},
    )


def Poisson(rate) -> RVRef:
    if _active() is None:
        return _direct_dist("Poisson", rate)
    return _builder().emit("Poisson", {"rate": _as_interface(rate)})


def Uniform(lo=0.0, hi=1.0) -> RVRef:
    if _active() is None:
        return _direct_dist("Uniform", lo, hi)
    return _builder().emit("Uniform", {"lo": _as_interface(lo), "hi": _as_interface(hi)})


def Transition(state_in, matrix) -> RVRef:
    """Discrete transition: out ~ Categorical(P[:, state_in]).

    Reference: DiscreteTransition node (HMM conformance test,
    test/models/statespace/hmm_tests.jl)."""
    return _builder().emit(
        "DiscreteTransition",
        {"in": _as_interface(state_in), "matrix": _as_interface(matrix)},
    )


DiscreteTransition = Transition


def _is_mv_component(v) -> bool:
    """True when a mixture component mean is vector-valued: a constant vector,
    or a random variable defined by an Mv* factor."""
    if isinstance(v, RVRef):
        for f in _builder().graph.factors:
            if f.out.var is v.ref.var:
                return f.fform.startswith("Mv")
        return False
    return np.ndim(np.asarray(v)) >= 1


def NormalMixture(switch, means, precisions) -> RVRef:
    """Gaussian mixture likelihood node (reference NormalMixture, GMM tests).

    Dispatches to the multivariate variant (MvNormal means + Wishart
    precisions; reference test/models/mixtures/gmm_multivariate_tests.jl)
    when the component means are vector-valued."""
    mv = any(_is_mv_component(m) for m in means)
    interfaces = {"switch": _as_interface(switch)}
    for i, m in enumerate(means):
        interfaces[f"mean{i}"] = _as_interface(m)
    for i, p in enumerate(precisions):
        interfaces[f"prec{i}"] = _as_interface(p)
    return _builder().emit(
        "MvNormalMixture" if mv else "NormalMixture",
        interfaces, meta={"K": len(means)},
    )


def GammaMixture(switch, shapes, rates) -> RVRef:
    interfaces = {"switch": _as_interface(switch)}
    for i, a in enumerate(shapes):
        interfaces[f"shape{i}"] = _as_interface(a)
    for i, b in enumerate(rates):
        interfaces[f"rate{i}"] = _as_interface(b)
    return _builder().emit("GammaMixture", interfaces, meta={"K": len(shapes)})


def Mixture(switch, components) -> RVRef:
    """Generic mixture node (reference Mixture(switch=...))."""
    interfaces = {"switch": _as_interface(switch)}
    for i, c in enumerate(components):
        interfaces[f"comp{i}"] = _as_interface(c)
    return _builder().emit("Mixture", interfaces, meta={"K": len(components)})


def Sum(*terms) -> RVRef:
    """Deterministic sum of random variables ('+' node in the reference)."""
    interfaces = {f"in{i}": _as_interface(t) for i, t in enumerate(terms)}
    return _builder().emit("Sum", interfaces)


def OR(a, b) -> RVRef:
    """Boolean OR node (reference alias ``a || b``)."""
    return _builder().emit("OR", {"in1": _as_interface(a), "in2": _as_interface(b)})


def AND(a, b) -> RVRef:
    return _builder().emit("AND", {"in1": _as_interface(a), "in2": _as_interface(b)})


def NOT(a) -> RVRef:
    return _builder().emit("NOT", {"in": _as_interface(a)})


def IMPLY(a, b) -> RVRef:
    return _builder().emit("IMPLY", {"in1": _as_interface(a), "in2": _as_interface(b)})


def Uninformative() -> RVRef:
    """Flat prior (reference Uninformative node)."""
    return _builder().emit("Uninformative", {})


def tie(x: RVRef, node: RVRef) -> RVRef:
    """Attach an additional factor to an existing random variable.

    Reference semantics: the same variable appearing on the LHS of ``~`` more
    than once (e.g. ``x ~ IMPLY(...)`` followed by ``x ~ Bernoulli(y)``,
    test/models/aliases/aliases_binary_tests.jl:15-16) attaches every such
    factor to the one variable; its marginal is the constrained product of all
    inbound messages.  ``node`` must be a just-created factor output (its
    anonymous output variable is rebound to ``x``)."""
    if not isinstance(x, RVRef) or not isinstance(node, RVRef):
        raise TypeError("tie(x, node) expects two random-variable references.")
    b = _builder()
    anon_var = node.ref.var
    for f in b.graph.factors:
        if f.out.var is anon_var:
            f.evidence = True
    b.rebind(node.ref, x.ref)
    return x


def lincomb(expr) -> RVRef:
    """Materialize a deterministic linear combination of random variables:
    ``x_next = lincomb(A @ x + B @ u)`` — the reference's composed ``*``/``+``
    deterministic nodes (``x[t+1] ~ A * x[t] + B * u[t]``,
    test/models/statespace/collision_tests.jl:66-68)."""
    if isinstance(expr, RVRef):
        return expr
    if isinstance(expr, LinearExpr):
        expr = AddExpr((expr,))
    if not isinstance(expr, AddExpr):
        raise TypeError("lincomb() expects a sum of rv / A @ rv terms.")
    interfaces = {}
    bias = None
    for i, t in enumerate(expr.terms):
        if isinstance(t, RVRef):
            interfaces[f"in{i}"] = t.ref
            interfaces[f"A{i}"] = Const(np.asarray(1.0))
        else:
            if isinstance(t.a, Ref):
                raise TypeError("lincomb() with data-indexed maps not supported.")
            interfaces[f"in{i}"] = t.x.ref
            interfaces[f"A{i}"] = Const(
                np.asarray(t.a if t.a is not None else 1.0)
            )
            if t.b is not None:
                bias = t.b if bias is None else bias + t.b
    if bias is not None:
        interfaces["b"] = Const(np.asarray(bias))
    return _builder().emit("LinComb", interfaces)


def factor_node(fform: str, **interfaces) -> RVRef:
    """Emit a user-registered custom node by name (reference: custom @node
    types used directly in @model, docs/src/manuals/inference/create-node.md).

    Register rules first with ``@rxinfer_tpu.rules.registry.node("Name")``; a
    node defining only ``logpdf`` works with
    ``infer(options={"rulefallback": NodeFunctionRuleFallback()})``."""
    return _builder().emit(
        fform, {k: _as_interface(v) for k, v in interfaces.items()}
    )


def Probit(x) -> RVRef:
    return _builder().emit("Probit", {"in": _as_interface(x)})


def SoftDot(theta, x, gamma) -> RVRef:
    return _builder().emit(
        "SoftDot",
        {"theta": _as_interface(theta), "x": _as_interface(x), "gamma": _as_interface(gamma)},
    )


class ARsafe:
    """Stability variant marker (reference ARMeta's ARsafe).  The TPU AR chain
    block is solved by an exact (associative-scan) Kalman smoother, which is
    unconditionally the 'safe' path — ARunsafe is accepted and ignored."""


class ARunsafe:
    pass


class ARMeta:
    """Reference ``ARMeta(Multivariate|Univariate, order, ARsafe())``
    (docs: latent AR models).  Variate kind is inferred from order here."""

    def __init__(self, variate_or_order=None, order=None, stability=None):
        if order is None and isinstance(variate_or_order, int):
            order = variate_or_order
        if not isinstance(order, int):
            raise TypeError("ARMeta requires an integer order.")
        self.order = order
        self.stability = stability if stability is not None else ARsafe()


def AR(prev, theta, gamma, order: int = None, meta: "ARMeta" = None) -> RVRef:
    """Autoregressive node (reference AR + ARMeta + ARsafe)."""
    if meta is not None:
        order = meta.order
    if order is None:
        raise TypeError("AR requires order= (or meta=ARMeta(order)).")
    return _builder().emit(
        "AR",
        {"in": _as_interface(prev), "theta": _as_interface(theta), "gamma": _as_interface(gamma)},
        meta={"order": order},
    )


def GCV(x_prev, z, kappa=1.0, omega=0.0) -> RVRef:
    """Gaussian controlled-variance node: out ~ N(x_prev, exp(kappa*z + omega))
    (HGF building block; reference GCV + GCVMetadata)."""
    return _builder().emit(
        "GCV",
        {
            "in": _as_interface(x_prev),
            "z": _as_interface(z),
            "kappa": _as_interface(kappa),
            "omega": _as_interface(omega),
        },
    )


def Delta(fn, *args, method=None, inverse=None) -> RVRef:
    """Nonlinear deterministic node out = fn(args...) with an approximation method
    (reference DeltaMeta(method=Linearization()/Unscented()/CVIProjection()),
    docs/src/manuals/inference/delta-node.md)."""
    interfaces = {f"in{i}": _as_interface(a) for i, a in enumerate(args)}
    return _builder().emit(
        "Delta", interfaces, meta={"fn": fn, "method": method, "inverse": inverse}
    )


# ---------------------------------------------------------------------------------
# @model decorator and generator
# ---------------------------------------------------------------------------------

class ModelGenerator:
    """Lazy model: function + bound hyperparameters.  Conditioning on data traces
    the graph (reference: ModelGenerator + ``condition_on``/``|``,
    src/model/model.jl:109-177)."""

    def __init__(self, fn, bound: dict[str, Any]):
        self.fn = fn
        self.bound = dict(bound)
        self.name = fn.__name__

    def __call__(self, **kwargs) -> "ModelGenerator":
        merged = {**self.bound, **kwargs}
        return ModelGenerator(self.fn, merged)

    def __or__(self, data: dict) -> ModelGraph:
        return self.trace(data)

    def trace(self, data: dict[str, Any],
              allow_node_contraction: bool = False) -> ModelGraph:
        """Build the factor graph for the given data (shapes taken from values)."""
        builder = ModelBuilder(self.name)
        builder.allow_node_contraction = allow_node_contraction
        prev = getattr(_STATE, "builder", None)
        _STATE.builder = builder
        try:
            from ..dists import Distribution

            call_kwargs: dict[str, Any] = {}
            for k, v in self.bound.items():
                if isinstance(v, Distribution) or callable(v):
                    call_kwargs[k] = v  # dist-object priors / fn hyperparams
                else:
                    call_kwargs[k] = np.asarray(v) if not np.isscalar(v) else v
            for k, v in data.items():
                arr = np.asarray(v) if v is not None else None
                if arr is None:
                    raise ValueError(f"Data entry {k} is None")
                length = arr.shape[0] if arr.ndim >= 1 else None
                var = builder.graph.add_variable(Variable(k, "data", length))
                call_kwargs[k] = DataArray(var, arr.shape, arr.dtype)
            ret = self.fn(**call_kwargs)
            # Explicit naming via dict return: {"theta": rvref, ...}
            if isinstance(ret, dict):
                for k, v in ret.items():
                    if isinstance(v, RVRef):
                        v.ref.var.name = k
                    elif isinstance(v, (LatentArray,)):
                        v._var.name = k
                    elif isinstance(v, Distribution):
                        # dist-object prior returned by name: rename the
                        # lifted variable so posteriors are keyed by it
                        hit = getattr(builder, "_dist_lift_memo", {}).get(id(v))
                        if hit is not None:
                            hit[1].ref.var.name = k
            # reference: arbitrary @model return values are kept on the model
            # (`getreturnval(result.model)`, inference_tests.jl:366-376)
            builder.graph.returnval = ret
        finally:
            _STATE.builder = prev
        builder.graph.validate()
        return builder.graph


def model(fn) -> ModelGenerator:
    """Decorator: ``@model def m(y, A, B): ...`` — mirrors the reference ``@model``
    macro (src/model/graphppl.jl:186-192).  Arguments bound via ``m(A=..., B=...)``
    are hyperparameters (baked constants); the rest are data variables supplied via
    ``infer(data={...})``."""
    return ModelGenerator(fn, {})


def datavar(*args, **kwargs):  # pragma: no cover - compat shim
    raise RuntimeError(
        "datavar() is not needed: declare data as model-function arguments "
        "(the reference likewise forbids legacy datavar, src/model/graphppl.jl:35-48)."
    )
