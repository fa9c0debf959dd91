"""Scalar function library (SURVEY.md §2 A5 selectors/keys + §2.6
string/date helpers) as pure Column expressions — the engine's
re-expression of the reference's row-scalar utilities.  Each function
has a ``*_py`` twin used by fixtures/tests so goldens never depend on
the Spark implementation.

Reference points (all /root/reference/ferenda/):
- normalize_space      util.py:279-290
- title_sortkey        util.py:722-731
- split_numalpha       util.py:207-237 (natural sort)
- from_roman           util.py:693-720
- ucfirst              util.py:451-457
- uri_leaf             util.py:625-640
- base27encode/decode  util.py:839-868
- year/firstletter/... facet.py:128-280
- sv_collate_key       documentrepository.py:2686-2688 (strxfrm twin)
"""

from ferenda_spark.functions.scalars import (  # noqa: F401
    base27_encode_py,
    firstletter,
    from_roman,
    from_roman_py,
    natural_sort_key,
    natural_sort_key_py,
    normalize_space,
    normalize_space_py,
    slugify,
    slugify_py,
    sv_collate_key,
    sv_collate_key_py,
    title_sortkey,
    title_sortkey_py,
    ucfirst,
    uri_leaf,
    uri_leaf_py,
    year_of,
)
