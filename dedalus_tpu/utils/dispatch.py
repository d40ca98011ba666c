"""
Multiclass dispatch metaclass (parity: dedalus/tools/dispatch.py).

`MultiClass` lets a family of sibling classes share one constructor name:
calling the parent dispatches to the first subclass whose `_check_args`
accepts the arguments (the reference uses this for geometry dispatch of
operators, e.g. Gradient -> CartesianGradient / SphericalGradient). A
`_preprocess_args` hook can canonicalize arguments before dispatch, and
raising `SkipDispatchException(output)` from a subclass constructor
short-circuits the dispatch with a precomputed result.
"""


class SkipDispatchException(Exception):
    """Raised inside a dispatched constructor to return `output` directly
    instead of an instance of the subclass."""

    def __init__(self, output):
        super().__init__()
        self.output = output


class MultiClass(type):

    def __call__(cls, *args, **kw):
        if hasattr(cls, '_preprocess_args'):
            args, kw = cls._preprocess_args(*args, **kw)
        # Concrete leaf: build directly
        if not cls.__subclasses__():
            try:
                return super().__call__(*args, **kw)
            except SkipDispatchException as exc:
                return exc.output
        # Dispatch to the first subclass accepting the arguments
        for sub in cls.__subclasses__():
            check = getattr(sub, '_check_args', None)
            if check is None or check(*args, **kw):
                try:
                    return sub(*args, **kw)
                except SkipDispatchException as exc:
                    return exc.output
        raise NotImplementedError(
            f"No subclass of {cls.__name__} accepts the given arguments")
