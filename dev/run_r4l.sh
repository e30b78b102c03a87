#!/bin/bash
# r4l: DINO train-step — honest step timing at small res, then the
# production 800x1216 attempt (post 39a5ec4 + ffb5fb8 fixes).
cd /root/repo
mkdir -p dev/logs
for v in small fullprod; do
  case $v in
    small)    args="small" ;;
    fullprod) args="full" ;;
  esac
  echo "=== $v ==="
  timeout 1800 python dev/probe_dino_train_ladder.py $args \
    > dev/logs/r4l_${v}.json 2> dev/logs/r4l_${v}.err
  echo "exit=$? $(cat dev/logs/r4l_${v}.json)"
done
echo R4L_DONE
