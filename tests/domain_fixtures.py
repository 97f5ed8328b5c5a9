"""Test domain: Order aggregate + events, port of the reference test domain
(/root/reference/CloudFabric.EventSourcing.Tests/Domain/*: Order.cs,
Events/OrderPlaced.cs, OrderItemAdded.cs, OrderItemRemoved.cs,
ValueObjects/OrderItem.cs, PartitionKeys.cs)."""

from __future__ import annotations

import dataclasses
import datetime
import decimal

from cloudfabric_eventsourcing_spark.domain import AggregateBase
from cloudfabric_eventsourcing_spark.eventstore import Event, register_event_type

ORDERS_PARTITION_KEY = "OrderEntity"


def _item_dict(i: "OrderItem") -> dict:
    # shallow field dict; dataclasses.asdict deep-copies every leaf and
    # dominated the append-benchmark profile
    return {"added_at": i.added_at, "name": i.name, "amount": i.amount}


def utcnow():
    return datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


@dataclasses.dataclass
class OrderItem:
    added_at: datetime.datetime
    name: str
    amount: decimal.Decimal

    @staticmethod
    def from_dict(d):
        if isinstance(d, OrderItem):
            return d
        added = d["added_at"]
        if isinstance(added, str):
            added = datetime.datetime.fromisoformat(added)
        return OrderItem(added, d["name"], decimal.Decimal(str(d["amount"])))


@register_event_type
@dataclasses.dataclass
class OrderPlaced(Event):
    order_name: str = ""
    items: list = dataclasses.field(default_factory=list)
    created_by_id: str = ""
    created_by_email: str = ""


@register_event_type
@dataclasses.dataclass
class OrderItemAdded(Event):
    item: dict = dataclasses.field(default_factory=dict)


@register_event_type
@dataclasses.dataclass
class OrderItemRemoved(Event):
    item_name: str = ""


class Order(AggregateBase):
    @property
    def partition_key(self) -> str:
        return ORDERS_PARTITION_KEY

    def __init__(self, *args, **kwargs):
        self.name = ""
        self.items: list[OrderItem] = []
        self.created_by_id = ""
        self.created_by_email = ""
        if args and isinstance(args[0], list):
            super().__init__(args[0])
        else:
            super().__init__()
            if kwargs or len(args) >= 2:
                id_, name = args[0], args[1]
                items = args[2] if len(args) > 2 else kwargs.get("items", [])
                self.apply(
                    OrderPlaced(
                        aggregate_id=id_,
                        partition_key=ORDERS_PARTITION_KEY,
                        order_name=name,
                        items=[_item_dict(i) for i in items],
                        created_by_id=kwargs.get("created_by_id", ""),
                        created_by_email=kwargs.get("created_by_email", ""),
                    )
                )

    def add_item(self, item: OrderItem):
        self.apply(
            OrderItemAdded(
                aggregate_id=self.id,
                partition_key=ORDERS_PARTITION_KEY,
                item=_item_dict(item),
            )
        )

    def remove_item(self, name: str):
        self.apply(
            OrderItemRemoved(
                aggregate_id=self.id,
                partition_key=ORDERS_PARTITION_KEY,
                item_name=name,
            )
        )

    # fold handlers (On(...) in the reference, Order.cs)
    def on_OrderPlaced(self, e: OrderPlaced):
        self._id = e.aggregate_id
        self.name = e.order_name
        self.items = [OrderItem.from_dict(i) for i in e.items]
        self.created_by_id = e.created_by_id
        self.created_by_email = e.created_by_email

    def on_OrderItemAdded(self, e: OrderItemAdded):
        self.items.append(OrderItem.from_dict(e.item))

    def restore_snapshot(self, state: dict) -> None:
        # the documented override: items carry Decimal/datetime the
        # handlers compare on, so revive them from the JSON-able state
        super().restore_snapshot(state)
        self.items = [OrderItem.from_dict(_item_dict(i) if not isinstance(i, dict) else i) for i in self.items]

    def on_OrderItemRemoved(self, e: OrderItemRemoved):
        # remove only the FIRST name match (OrdersListProjectionBuilder.cs:58-66)
        for idx, item in enumerate(self.items):
            if item.name == e.item_name:
                del self.items[idx]
                break


# ---------------------------------------------------------------------------
# OrdersList projection (port of OrdersListProjectionBuilder.cs and
# OrderListProjectionItem.cs — FIXTURES.md §2)
# ---------------------------------------------------------------------------

from cloudfabric_eventsourcing_spark.projections import ProjectionBuilder  # noqa: E402
from cloudfabric_eventsourcing_spark.schema import (  # noqa: E402
    ARRAY,
    DATETIME,
    DECIMAL,
    GUID,
    INT64,
    OBJECT,
    STRING,
    ProjectionSchema,
    PropertySchema,
)


def orders_list_schema() -> ProjectionSchema:
    return ProjectionSchema(
        "orders_list_projection",
        [
            PropertySchema("Id", GUID, is_key=True),
            PropertySchema("PartitionKey", STRING, is_filterable=True),
            PropertySchema("UpdatedAt", DATETIME, is_filterable=True, is_sortable=True),
            PropertySchema("Name", STRING, is_searchable=True, is_filterable=True, is_sortable=True),
            PropertySchema("ItemsCount", INT64, is_filterable=True, is_sortable=True),
            PropertySchema(
                "Items",
                ARRAY,
                is_filterable=True,
                nested_properties=[
                    PropertySchema("AddedAt", DATETIME, is_filterable=True),
                    PropertySchema("Name", STRING, is_searchable=True),
                    PropertySchema("Amount", DECIMAL, is_filterable=True),
                ],
            ),
            PropertySchema(
                "CreatedBy",
                OBJECT,
                nested_properties=[
                    PropertySchema("UserId", GUID, is_filterable=True),
                    PropertySchema("Email", STRING, is_searchable=True, is_sortable=True),
                ],
            ),
        ],
    )


class OrdersListProjectionBuilder(ProjectionBuilder):
    aggregate_types = ("Order",)

    def on_OrderPlaced(self, evt: OrderPlaced):
        doc = {
            "Id": evt.aggregate_id,
            "Name": evt.order_name,
            "ItemsCount": len(evt.items),
            "Items": [
                {
                    "AddedAt": _ts(i.get("added_at")),
                    "Name": i.get("name"),
                    "Amount": decimal.Decimal(str(i.get("amount"))),
                }
                for i in evt.items
            ],
            "CreatedBy": {"UserId": evt.created_by_id, "Email": evt.created_by_email},
        }
        self.upsert_document(doc, evt.partition_key, evt.timestamp)

    def on_OrderItemAdded(self, evt: OrderItemAdded):
        def mutate(doc):
            doc["Items"] = list(doc["Items"]) + [
                {
                    "AddedAt": _ts(evt.item.get("added_at")),
                    "Name": evt.item.get("name"),
                    "Amount": decimal.Decimal(str(evt.item.get("amount"))),
                }
            ]
            doc["ItemsCount"] += 1

        self.update_document(evt.aggregate_id, evt.partition_key, evt.timestamp, mutate)

    def on_OrderItemRemoved(self, evt: OrderItemRemoved):
        def mutate(doc):
            items = list(doc["Items"])
            for idx, item in enumerate(items):
                if item["Name"] == evt.item_name:
                    del items[idx]
                    doc["ItemsCount"] -= 1
                    break
            doc["Items"] = items

        self.update_document(evt.aggregate_id, evt.partition_key, evt.timestamp, mutate)

    def on_AggregateUpdated(self, evt):
        self.set_document_updated_at(evt.aggregate_id, evt.partition_key, evt.updated_at)


def _ts(v):
    if isinstance(v, str):
        return datetime.datetime.fromisoformat(v)
    return v
