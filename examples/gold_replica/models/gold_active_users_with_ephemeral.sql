{{ gold_active_entities_with_ephemeral('user_id') }}
