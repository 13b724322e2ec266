"""One-process perf lab: compile once, then measure phases and variants.
Writes findings to stderr; run in background."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, cv2
import concurrent.futures as cf
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def main():
    from stereovision_tpu.engine import StereoEngine, bgr_to_gray
    
    W, H = 1242, 375
    eng = StereoEngine("stereovision_tpu/data/kitti_2011_09_26.yml", W, H, use_pallas=True)
    kitti = "/root/reference/datasets/kitti_mini"
    imgs = []
    for i in range(21):
        l = cv2.imread(f"{kitti}/image_02/data/{i:010d}.png"); r = cv2.imread(f"{kitti}/image_03/data/{i:010d}.png")
        imgs.append((cv2.resize(l,(W,H)), cv2.resize(r,(W,H))))
    f_a, f_tail = eng._batched_fns
    ex = cf.ThreadPoolExecutor(8)
    B = 8
    def make_batch(k):
        g1 = np.stack([bgr_to_gray(imgs[(k*B+i)%21][0]) for i in range(B)])
        g2 = np.stack([bgr_to_gray(imgs[(k*B+i)%21][1]) for i in range(B)])
        return g1, g2
    t0=time.time()
    g1, g2 = make_batch(0)
    a = f_a(jnp.asarray(np.stack([g1, g2], axis=1)))
    dcs = np.asarray(a[2]); gs = list(ex.map(eng.elas.host_mid, [dcs[i] for i in range(B)]))
    st = {k: jnp.asarray(np.stack([g[k] for g in gs]))
          for k in gs[0]}
    bufs = jnp.asarray(np.stack([eng.elas.pack_geometry(g) for g in gs]))
    out = f_tail(a[0], a[1], bufs)
    np.asarray(out[1])
    log("compile+warm: %.0f s" % (time.time()-t0))
    
    # phase timestamps
    for k in range(1, 5):
        t0=time.perf_counter()
        g1, g2 = make_batch(k)
        t1=time.perf_counter()
        a = f_a(jnp.asarray(np.stack([g1, g2], axis=1)))
        t2=time.perf_counter()
        dcs = np.asarray(a[2])
        t3=time.perf_counter()
        gs = list(ex.map(eng.elas.host_mid, [dcs[i] for i in range(B)]))
        t4=time.perf_counter()
        bufs = jnp.asarray(np.stack([eng.elas.pack_geometry(g)
                                     for g in gs]))
        t5=time.perf_counter()
        out = f_tail(a[0], a[1], bufs)
        t6=time.perf_counter()
        dm = np.asarray(out[1])
        t7=time.perf_counter()
        log("gray %.0f | dispA %.0f | waitA %.0f | host %.0f | H2D %.0f | dispT %.0f | waitT %.0f || tot %.0f"
            % tuple(1000*np.array([t1-t0,t2-t1,t3-t2,t4-t3,t5-t4,t6-t5,t7-t6,t7-t0])))
    
    # serial host (no threads) for comparison
    t0=time.perf_counter()
    gs2 = [eng.elas.host_mid(dcs[i]) for i in range(B)]
    log("host serial: %.0f ms" % (1000*(time.perf_counter()-t0)))
    
    # dense-tail-only repeat (device time)
    def sync1(x): np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        sync1(f_tail(a[0], a[1], bufs))
        ts.append(time.perf_counter()-t0)
    log("tail only: %.0f ms/batch" % (1000*min(ts)))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); sync1(f_a(jnp.asarray(np.stack([g1, g2], axis=1)))); ts.append(time.perf_counter()-t0)
    log("A only: %.0f ms/batch" % (1000*min(ts)))
    
    # end-to-end best
    for trial in range(2):
        t0=time.time(); n=0
        def frames(n_):
            for i in range(n_): yield imgs[i%21]
        for o in eng.stream_batched(frames(48), batch=8, fetch="dmap"): n+=1
        log("stream_batched(8) FPS: %.2f" % (n/(time.time()-t0)))


if __name__ == "__main__":
    main()
