{{ gold_active_entities_with_ephemeral('device_id') }}
