"""AOT inference engine: graph compiler, chain solvers, Bethe FE (L4-equivalent)."""

from .compile import CompiledModel
