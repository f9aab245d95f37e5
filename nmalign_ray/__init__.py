"""nmalign_ray — Ray-Data-native forced-alignment extraction engine.

Library API mirrors the reference's top-level export
(``/root/reference/nmalign/__init__.py`` exposes ``nmalign.match``):

    from nmalign_ray import match
    result, scores = match(["ground", "truth"], ["noisy ocr lines"])

plus the engine-level entry points:

    from nmalign_ray import AlignConfig, EngineConfig, build_extract_pipeline
"""

from .align import AlignConfig, match

__all__ = ["AlignConfig", "match", "EngineConfig", "build_extract_pipeline"]


def __getattr__(name):
    # lazy: keep `import nmalign_ray` Ray-free for oracle/CLI use
    if name == "EngineConfig":
        from .schema import EngineConfig

        return EngineConfig
    if name == "build_extract_pipeline":
        from .pipelines import build_extract_pipeline

        return build_extract_pipeline
    raise AttributeError(name)
