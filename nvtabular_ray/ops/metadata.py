"""Schema-metadata ops: AddMetadata / AddTags / AddProperties / TagAs*.

Reference: /root/reference/nvtabular/ops/add_metadata.py:21-72 — identity on
data; attach tags/properties to the output schema. Tag vocabulary from the
reference (add_metadata.py:54-72, loader/backend.py:31-37).

The engine's schema side-channel: ``Workflow.output_metadata()`` walks the
DAG collecting each op's ``output_tags`` / ``output_properties`` per column.
"""

from __future__ import annotations

import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class Tags:
    CATEGORICAL = "categorical"
    CONTINUOUS = "continuous"
    LIST = "list"
    TARGET = "target"
    ID = "id"
    USER = "user"
    ITEM = "item"
    USER_ID = "user_id"
    ITEM_ID = "item_id"


class AddMetadata(Operator):
    def __init__(self, tags=None, properties=None):
        self.tags = list(tags or [])
        self.properties = dict(properties or {})

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        return table.select(col_selector.names)

    @property
    def output_tags(self):
        return self.tags

    def output_properties(self):
        return self.properties


class AddTags(AddMetadata):
    def __init__(self, tags=None):
        super().__init__(tags=tags)


class AddProperties(AddMetadata):
    def __init__(self, properties=None):
        super().__init__(properties=properties)


class TagAsUserID(AddMetadata):
    def __init__(self):
        super().__init__(tags=[Tags.ID, Tags.USER, Tags.USER_ID])


class TagAsItemID(AddMetadata):
    def __init__(self):
        super().__init__(tags=[Tags.ID, Tags.ITEM, Tags.ITEM_ID])


class TagAsUserFeatures(AddMetadata):
    def __init__(self):
        super().__init__(tags=[Tags.USER])


class TagAsItemFeatures(AddMetadata):
    def __init__(self):
        super().__init__(tags=[Tags.ITEM])
