"""Embedded library usage: the programmatic equivalent of the memo CLI.

Run:  python examples/embedded_usage.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from c99_vectordb_tpu.api import MemoDB


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        db = MemoDB("notes", cwd=tmp)

        # Bulk insert — embedded in one batched device program.
        db.save_many(
            [
                {"body": "I prefer tea over coffee", "metadata": {"source": "user", "priority": 2}},
                {"body": "User enjoys morning workouts", "metadata": {"source": "agent", "tags": ["health"]}},
                {"body": "File taxes in April", "metadata": {"source": "user", "priority": 1}},
            ]
        )

        print("== semantic recall ==")
        for hit in db.recall("tea or coffee preference", k=2):
            print(f"  [{hit.doc_id}] score={hit.score:.4f}  {hit.body}")

        print("== filtered recall (Mongo-style metadata filters) ==")
        for hit in db.recall("preference", k=5, filter="{source: agent}"):
            print(f"  [{hit.doc_id}] {hit.body}  {hit.metadata}")

        print("== metadata scan ==")
        for doc_id, meta in db.analyze("{priority: {$gte: 2}}"):
            print(f"  [{doc_id}] {meta}")

        # Soft-delete + compaction
        db.save("tombstone", metadata={"deleted": True}, doc_id=1)
        dropped = db.reindex()
        print(f"== reindex dropped {dropped} record(s); {len(db)} remain ==")


if __name__ == "__main__":
    main()
