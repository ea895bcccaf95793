from .pipeline import correct_pipeline, flagship

__all__ = ["correct_pipeline", "flagship"]
