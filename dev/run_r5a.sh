#!/bin/bash
# r5a: DINO train-step decomposition at production 800x1216 (VERDICT r5 #2).
# fullprod landed at 3551.6 ms/step (dev/logs/r5_fullprod.json); this queue
# brackets where it goes: model-only fwd+bwd (sumloss), CDN off (nocdn),
# then the xplane per-fusion itemization of the full step.
cd /root/repo
mkdir -p dev/logs
for v in sumloss nocdn; do
  echo "=== $v ==="
  timeout 3600 python dev/probe_dino_train_ladder.py $v \
    > dev/logs/r5a_${v}.json 2> dev/logs/r5a_${v}.err
  echo "exit=$? $(cat dev/logs/r5a_${v}.json)"
done
echo "=== profile ==="
timeout 3600 python dev/probe_profile_dino_train.py full /tmp/dino_train_trace \
  > dev/logs/r5a_profile.log 2> dev/logs/r5a_profile.err
echo "exit=$?"
echo R5A_DONE
