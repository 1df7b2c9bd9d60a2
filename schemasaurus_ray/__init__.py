"""schemasaurus_ray — a Ray-Data-native schema + constraint validation engine.

From-scratch reimplementation of the *semantics* of brettz9/schemasaurus
(JSON-schema iterator/validator/normalizer) as a compiler from declarative
table specs into vectorized Arrow predicates executed with
``ray.data.Dataset.map_batches``, extended with table-level constraints
(stats, uniqueness, referential integrity, distribution drift) and
training-data operators (dedup, similarity search, text analysis).

Public API::

    from schemasaurus_ray import new_validator, new_normalizer      # row-level
    from schemasaurus_ray import parse_table_spec, validate_dataset  # Ray-level
"""

from .errors import MISSING, SpecError, ValidationError, ValidationResult
from .refeval import RowNormalizer, RowValidator
from .spec import TableSpec, parse_table_spec


def new_validator(schema, options=None) -> RowValidator:
    """Row-level validator (reference entry newValidator, src/iterator.js:14-16)."""
    return RowValidator(schema, options)


def new_normalizer(schema) -> RowNormalizer:
    """Row-level normalizer (reference entry newNormalizer, src/iterator.js:17-19)."""
    return RowNormalizer(schema)


__all__ = [
    "MISSING",
    "SpecError",
    "ValidationError",
    "ValidationResult",
    "RowValidator",
    "RowNormalizer",
    "TableSpec",
    "parse_table_spec",
    "new_validator",
    "new_normalizer",
]
