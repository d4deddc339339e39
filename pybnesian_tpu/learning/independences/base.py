"""Independence test interfaces
(reference learning/independences/independence.hpp:15-49)."""

from __future__ import annotations

__all__ = ["IndependenceTest", "DynamicIndependenceTest"]


class IndependenceTest:
    """pvalue(x, y, *z): null hypothesis is x ⫫ y | z."""

    def pvalue(self, x: str, y: str, *z: str) -> float:
        raise NotImplementedError

    def num_variables(self) -> int:
        return len(self.variable_names())

    def variable_names(self) -> list[str]:
        raise NotImplementedError

    def name(self, index: int) -> str:
        """Variable name at position ``index``
        (reference pybindings_independences.cpp:163)."""
        return self.variable_names()[index]

    def has_variables(self, variables) -> bool:
        if isinstance(variables, str):
            variables = [variables]
        names = set(self.variable_names())
        return all(v in names for v in variables)


class DynamicIndependenceTest:
    """Static + transition test pair (reference independence.hpp:33-49)."""

    test_cls = None

    def __init__(self, ddf, *args, **kwargs):
        from ...data.dynamic import DynamicDataFrame

        if not isinstance(ddf, DynamicDataFrame):
            raise TypeError(
                "Dynamic independence tests require a DynamicDataFrame"
            )
        self.ddf = ddf
        self._static = self.test_cls(ddf.static_df(), *args, **kwargs)
        self._transition = self.test_cls(ddf.transition_df(), *args, **kwargs)

    def static_tests(self) -> IndependenceTest:
        return self._static

    def transition_tests(self) -> IndependenceTest:
        return self._transition

    def variable_names(self) -> list[str]:
        return self.ddf.variables()

    def name(self, index: int) -> str:
        """Variable name at position ``index``
        (reference pybindings_independences.cpp:405)."""
        return self.variable_names()[index]

    def num_variables(self) -> int:
        return len(self.variable_names())

    def has_variables(self, variables) -> bool:
        if isinstance(variables, str):
            variables = [variables]
        names = set(self.variable_names())
        return all(v in names for v in variables)

    def markovian_order(self) -> int:
        return self.ddf.markovian_order()
